"""Scaling validation: synthesize a 10x dataset and time queries against it.

Usage::

    python tools_scale_check.py [query ...]          # default: dedup/LLM set
    python tools_scale_check.py --window             # full driver window
    python tools_scale_check.py --window --md SCALE.md   # write the ledger
    SPARK_GRAFT_SF1_DIR=/tmp/sf1 python tools_scale_check.py

Builds a sf1-equivalent dataset (ten id-offset copies of sf0.1, written
multi-row-group so scans split naturally — every document/vector gains 9
true duplicates, the worst case for near-dup operators), then reports
sf0.1 vs sf1 steady-state timings and the ratio. A fixed-output operator
should land well under 10x; anything super-linear is a scale bug.

With ``--md FILE`` the run also writes a markdown ledger (SCALE.md): one
row per query with both timings, the ratio, and a verdict —
``sub-linear`` (< 5x), ``linear`` (5-13x; at 10x data a ratio ~10x IS
linear scaling), ``super-linear`` (> 13x — a scale bug to fix).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohlc_spark_streaming_spark import build_session  # noqa: E402
from ohlc_spark_streaming_spark.registry import QUERIES  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
COPIES = 10  # override per-run with --copies (second-decade spot checks)

#: id column to offset per table (None: copy rows verbatim).
TABLES = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "nation": None,
    "region": None,
}

DEFAULT_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_ppjoin",
    "dedup_clusters",
    "dedup_clusters_star",
    "similarity_topk",
    "similarity_lsh_topk",
    "quality_repetition",
    "decontaminate_ngram",
    "domain_mixture",
    "text_lm_coverage",
    "text_tfidf",
    "pack_sequences",
    # round 4 additions
    "embedding_near_dup",
    "dedup_span_windows",
    "bm25_search",
    "split_leakage_audit",
    "skyline_orders",
    "fuzzy_match_parts",
    "candles_gap_fill",
    "funnel_conversion",
    "anomaly_zscore_events",
    "join_asof_forward",
    "lm_bigram_topk",
    "quality_classifier_bucket",
    "cdc_merge_orders",
    "scd2_user_state",
]


def synthesize(spark, dst: str = None, copies: int = None) -> None:
    import duckdb

    dst = dst or DST
    copies = copies or COPIES
    os.makedirs(dst, exist_ok=True)
    # Multiplier marker (ADVICE r8): existing parquet is skipped below, so
    # pointing --dst at a directory built at a DIFFERENT multiplier would
    # silently benchmark wrong-scale data and mislabel every ratio. Fail
    # fast when the marker disagrees with the requested copies.
    marker = os.path.join(dst, "_copies.json")
    if os.path.exists(marker):
        with open(marker) as f:
            built = json.load(f)
        if built.get("copies") != copies or built.get("src") != SRC:
            raise SystemExit(
                f"[scale] {dst} was built with copies={built.get('copies')} "
                f"src={built.get('src')!r}, but copies={copies} src={SRC!r} "
                "was requested — delete the directory or pass a fresh --dst"
            )
    con = duckdb.connect()
    for table, id_col in TABLES.items():
        out = os.path.join(dst, f"{table}.parquet")
        if os.path.exists(out):
            continue
        src = os.path.join(SRC, f"{table}.parquet")
        if id_col is None:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{out}' (FORMAT PARQUET)"
            )
            continue
        base = con.execute(f"SELECT max({id_col}) + 1 FROM '{src}'").fetchone()[0]
        # N id-offset copies; duplicate text/vector content is the POINT
        # (near-dup worst case). ROW_GROUP_SIZE keeps scans splittable.
        # Past ~16 copies the UNION ALL goes through a staged doubling so
        # DuckDB never parses a 100-branch union.
        stage = os.path.join(dst, f"_stage_{table}.parquet")
        union = " UNION ALL ".join(
            f"SELECT * REPLACE ({id_col} + {k * base} AS {id_col}) FROM '{src}'"
            for k in range(min(copies, 10))
        )
        con.execute(
            f"COPY ({union}) TO '{stage}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
        )
        done = min(copies, 10)
        while done < copies:
            step = min(done, copies - done)
            grow = (
                f"SELECT * FROM '{stage}' UNION ALL "
                f"SELECT * REPLACE ({id_col} + {done * base} AS {id_col}) "
                f"FROM '{stage}' WHERE {id_col} < {step * base}"
            )
            tmp = stage + ".next"
            con.execute(
                f"COPY ({grow}) TO '{tmp}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
            )
            os.replace(tmp, stage)
            done += step
        os.replace(stage, out)
        print(f"[scale] built {table} x{copies}", file=sys.stderr)
    with open(marker, "w") as f:
        json.dump({"copies": copies, "src": SRC}, f)


def best_of(spark, fn, n: int = 3) -> float:
    fn()  # warm (codegen, broadcast, page cache)
    best = None
    for _ in range(n):
        # Drop DataFrame persists between runs: operators that persist an
        # intermediate (shingle sets, group tables) would otherwise replay
        # the cache and report only the post-checkpoint cost.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def verdict(ratio: float) -> str:
    if ratio < 5.0:
        return "sub-linear"
    if ratio <= 13.0:
        return "linear"
    return "SUPER-LINEAR"


def main() -> None:
    argv = sys.argv[1:]
    md_out = None
    if "--md" in argv:
        i = argv.index("--md")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit(
                "usage: tools_scale_check.py [--window|--all] [--md PATH]"
                " [--ledger PATH] [query ...]"
            )
        md_out = argv[i + 1]
        del argv[i : i + 2]
    ledger = None
    if "--ledger" in argv:
        i = argv.index("--ledger")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("--ledger requires a path")
        ledger = argv[i + 1]
        del argv[i : i + 2]
    samples = 3
    if "--samples" in argv:
        # Second-decade spot checks: at 100x a single timed run of a
        # minutes-long query is plenty for a sub-linear/super-linear
        # verdict (the margin is 1.3x the multiplier), and best-of-3
        # plus the warm run quadruples a multi-hour sweep — the round-11
        # anti/full-outer 100x attempt timed out exactly this way.
        i = argv.index("--samples")
        samples = int(argv[i + 1])
        del argv[i : i + 2]
    copies, dst = COPIES, DST
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        del argv[i : i + 2]
        if dst == DST:
            dst = f"/tmp/sf_x{copies}"
    if "--dst" in argv:
        i = argv.index("--dst")
        dst = argv[i + 1]
        del argv[i : i + 2]
    append_md = None
    if "--append-md" in argv:
        i = argv.index("--append-md")
        append_md = argv[i + 1]
        del argv[i : i + 2]
    if "--all" in argv:
        argv.remove("--all")
        names = list(QUERIES)
    elif "--window" in argv:
        argv.remove("--window")
        from ohlc_spark_streaming_spark.registry import DRIVER_WINDOW

        names = list(DRIVER_WINDOW)
    else:
        names = argv or DEFAULT_QUERIES
    # Resumable sweeps: with --ledger, finished rows persist to a JSONL
    # file as they compute; a re-run skips names already in the ledger and
    # the final markdown is written from the ACCUMULATED rows, so a long
    # --all sweep survives interruption and runs in chunks.
    import json

    done: dict[str, tuple[float, float, float]] = {}
    if ledger and os.path.exists(ledger):
        with open(ledger) as f:
            for line in f:
                r = json.loads(line)
                done[r["name"]] = (r["small"], r["big"], r["ratio"])
    spark = build_session(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, dst=dst, copies=copies)
    print(f"{'query':35s} {'sf0.1':>8s} {'big':>8s} {'ratio':>6s}")
    results = [(n, *v) for n, v in done.items() if n in names]
    for name in names:
        if name in done:
            continue
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name:35s}  (unknown)")
            continue
        small = best_of(spark, lambda: fn(spark, SRC).count(), n=samples)
        spark.catalog.clearCache()
        big = best_of(spark, lambda: fn(spark, dst).count(), n=samples)
        spark.catalog.clearCache()
        ratio = big / small
        results.append((name, small, big, ratio))
        print(f"{name:35s} {small:7.2f}s {big:7.2f}s {ratio:5.1f}x", flush=True)
        if ledger:
            with open(ledger, "a") as f:
                f.write(
                    json.dumps(
                        {"name": name, "small": small, "big": big, "ratio": ratio}
                    )
                    + "\n"
                )
    spark.stop()
    if md_out:
        write_md(md_out, results)
    if append_md:
        append_spot_sweep(append_md, results, copies)


def append_spot_sweep(path: str, results, copies: int) -> None:
    """Append a second-decade spot-sweep section (e.g. 100x) to an
    existing SCALE.md without disturbing the full 10x ledger above it.
    The super-linear threshold scales with the multiplier: at Nx data,
    ~Nx time is linear; > 1.3*Nx flags super-linear (same 13/10 margin
    as the 10x verdict)."""
    limit = 1.3 * copies
    n_super = sum(1 for _, _, _, r in results if r > limit)
    lines = [
        "",
        f"## {copies}x spot-sweep (second decade)",
        "",
        f"Generated by `python tools_scale_check.py --copies {copies}"
        " --append-md SCALE.md <queries>` — the hottest dedup/graph",
        "queries re-checked one decade further to confirm the",
        "banding/collapse math holds beyond the 10x point. Verdict",
        f"margin scales with the multiplier: super-linear > {limit:.0f}x.",
        "",
        f"| query | sf0.1 | {copies}x | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, small, big, ratio in sorted(results, key=lambda t: -t[3]):
        v = "SUPER-LINEAR" if ratio > limit else (
            "sub-linear" if ratio < copies / 2 else "linear"
        )
        lines.append(
            f"| {name} | {small:.2f}s | {big:.2f}s | {ratio:.1f}x | {v} |"
        )
    lines.append("")
    section = "\n".join(lines)
    with open(path, "a") as f:
        f.write(section)
    # Mirror into the durable appendix so the next full --md rewrite
    # keeps this section (write_md re-attaches SCALE_APPENDIX.md).
    appendix = os.path.join(os.path.dirname(os.path.abspath(path)) or ".",
                            "SCALE_APPENDIX.md")
    with open(appendix, "a") as f:
        f.write(section)
    print(f"appended {copies}x spot-sweep to {path} ({len(results)} queries)")


def write_md(path: str, results) -> None:
    n_super = sum(1 for _, _, _, r in results if verdict(r) == "SUPER-LINEAR")
    lines = [
        "# SCALE — 10x duplication scaling ledger",
        "",
        "Generated by `python tools_scale_check.py --all --md SCALE.md`.",
        "",
        "Method: ten id-offset copies of sf0.1 (every document/vector gains",
        "9 true duplicates — the worst case for near-dup operators), written",
        "multi-row-group so scans split. Timings are best-of-3 steady-state",
        "(`.count()` after a warm run, caches dropped between runs) on",
        "local[32]; absolute numbers carry this VM's 2-5x jitter, the RATIO",
        "column is the signal. Verdict: sub-linear < 5x, linear 5-13x",
        "(10x data -> ~10x time IS linear), SUPER-LINEAR > 13x = scale bug.",
        "",
        f"Queries: {len(results)}. Super-linear: **{n_super}**.",
        "",
        "| query | sf0.1 | 10x | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, small, big, ratio in sorted(results, key=lambda t: -t[3]):
        lines.append(
            f"| {name} | {small:.2f}s | {big:.2f}s | {ratio:.1f}x | {verdict(ratio)} |"
        )
    lines.append("")
    body = "\n".join(lines)
    # A full --md rewrite must not erase the curated second-decade
    # appendix (the 100x spot-sweep sections + round notes live in
    # SCALE_APPENDIX.md; keep that file the source of truth and
    # re-attach it on every rewrite).
    appendix = os.path.join(os.path.dirname(os.path.abspath(path)) or ".",
                            "SCALE_APPENDIX.md")
    if os.path.exists(appendix):
        with open(appendix) as f:
            body += "\n" + f.read().rstrip() + "\n"
    with open(path, "w") as f:
        f.write(body)
    print(f"wrote {path} ({len(results)} queries, {n_super} super-linear)")


if __name__ == "__main__":
    main()
