"""Benchmark harness: runs the engine's headline queries and prints ONE JSON
line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); parallelism
from $SPARK_GRAFT_CPUS (default all cores). Each query is executed to
completion (count of a noop-projection) so the measured time includes the
full plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohlc_spark_streaming_spark import build_session  # noqa: E402
from ohlc_spark_streaming_spark.registry import QUERIES  # noqa: E402

# Headline queries: the flagship plus one representative per operator family.
# Extended as families land; keep this list in sync with SURVEY.md §2.
HEADLINE = [
    "ohlc_candles",
    "trade_pipeline",
    "streaming_ohlc_candles",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_asof_purchase_view",
    "window_running_total",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
    "similarity_lsh_topk",
    "text_quality",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="engine-bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # Warm the file listing / JVM on the first query only implicitly;
        # measure end-to-end execution (df.count() forces the full plan).
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
