"""Refresh bench_baseline.json from the latest full bench artifact.

Run AFTER a clean (idle-machine) ``python bench.py``:
``python tools_refresh_baseline.py <round>`` copies BENCH_LOCAL.json's
per-query timings into bench_baseline.json so every headline query has a
regression gate next round (VERDICT r5: the baseline had gone stale at
round 2, leaving 52/87 queries ungated).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print("usage: python tools_refresh_baseline.py <round-number>")
        raise SystemExit(2)
    rnd = int(sys.argv[1])
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)
    baseline = {
        "note": (
            f"local full-bench run committed in round {rnd} "
            "(BENCH_LOCAL.json, sf0.1, local[32], min-of-3 after warm-up); "
            "refresh with tools_refresh_baseline.py after each clean run"
        ),
        "round": rnd,
        "sf": bench["sf"],
        "total_sec": bench["value"],
        "queries": bench["queries"],
    }
    with open(os.path.join(ROOT, "bench_baseline.json"), "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"bench_baseline.json <- round {rnd}: {len(bench['queries'])} queries, "
        f"total {bench['value']}s"
    )


if __name__ == "__main__":
    main()
