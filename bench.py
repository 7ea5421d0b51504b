"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: one+ per SURVEY.md §2 family.
HEADLINE = [
    "flagship_service_area_report",
    "agg_stats_by_group",
    "top_revenue_orders",
    "latest_update_per_entity",
    "group_combine_collect",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_quality_score",
    "geo_point_in_polygon",
    "geo_union_grid_area",
    "events_sessionize",
    "events_asof_attribution",
    "regional_order_volume",
]


def main() -> None:
    from utility_service_areas_spark.plans.registry import all_queries
    from utility_service_areas_spark.session import build_session

    spark = build_session("usa-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/session on the smallest SF so we measure the query,
    # not session startup.
    qs[names[0]](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
