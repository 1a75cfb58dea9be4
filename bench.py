#!/usr/bin/env python
"""Benchmark headline queries (driver contract: one JSON line).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes to completion through
the noop sink (full pipeline, no driver-side row materialization).
Session startup is excluded; a warm-up query primes the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdata_project_spark.registry import REGISTRY, _ensure_loaded
from bigdata_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family, weighted toward shuffle-heavy work
HEADLINE = [
    "agg_pricing_summary",
    "agg_rollup_region_nation",
    "join_revenue_per_nation",
    "join_shipping_priority_top10",
    "join_asof_purchase_click",
    "window_running_spend",
    "sort_top100_orders",
    "events_tumbling_hourly",
    "events_session_30m",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
    "sim_ann_lsh_bucketed",
    "sim_ann_lsh_banded",
    "sim_ann_ivf_probe",
    "text_stats_quality",
    "text_tfidf_top3",
    "text_bm25_topk",
    "join_q5_regional_revenue",
    "events_gapfill_hourly",
    "events_funnel_view_click_purchase",
]


def main() -> None:
    _ensure_loaded()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        df = REGISTRY[name].fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("agg_pricing_summary")  # warm-up (JVM + codegen + parquet footer cache)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run(name), 4)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
