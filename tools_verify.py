"""One-command replica of the driver's verify: t1 smoke + full t2 sweep.

Usage::

    python tools_verify.py                    # sweep at sf0.01 (driver's sf)
    python tools_verify.py --sf /root/testdata/sf0.001
    python tools_verify.py --window           # exactly the driver's 50-slot window
    python tools_verify.py bm25_search scd2_user_state   # subset

Runs ``__spark_entry__.entry()`` under a PLAIN SparkSession (no engine
confs — the engine must self-configure), then compares every
oracle-backed ``queries()`` entry against its DuckDB ``oracle_sql()``
twin with the STRICT comparator (bitwise floats, type discipline —
tests/oracle_utils.py). Exit code 0 iff everything matches.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [REPO, os.path.join(REPO, "tests")]


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    use_window = "--window" in argv
    if use_window:
        argv.remove("--window")
    only = set(argv)
    if use_window:
        from ohlc_spark_streaming_spark.registry import DRIVER_WINDOW

        only |= set(DRIVER_WINDOW)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    import oracle_utils

    n_smoke = len(entry_mod.entry(spark).collect())
    print(f"[verify] t1 smoke: {n_smoke} rows", file=sys.stderr)
    if n_smoke <= 0:
        # not an assert: must survive `python -O`
        print("[verify] t1 smoke FAILED: entry() returned 0 rows")
        sys.exit(1)

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = [n for n in qs if n in osql and (not only or n in only)]
    print(
        f"[verify] t2 sweep: {len(names)} queries at {sf_dir}", file=sys.stderr
    )
    t0 = time.perf_counter()
    fails = []
    for k, name in enumerate(names, 1):
        try:
            oracle_utils.compare_query_to_oracle(
                spark, qs[name], osql[name], sf_dir
            )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            fails.append(name)
            print(f"[verify] FAIL {name}: {str(e)[:300]}", file=sys.stderr)
        if k % 25 == 0:
            print(f"[verify] ... {k}/{len(names)}", file=sys.stderr)
    dt = time.perf_counter() - t0
    status = "OK" if not fails else f"{len(fails)} FAILURES: {fails}"
    print(f"[verify] {len(names) - len(fails)}/{len(names)} in {dt:.0f}s — {status}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
