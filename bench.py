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

# The heaviest post-r5 operators (VERDICT r6 task 7), benched
# SEPARATELY from the headline total so the r1-baseline series stays
# apples-to-apples. These are evaluated through the noop sink, not
# count(): count() lets Catalyst join-eliminate whole subtrees (e.g.
# dedup_exact_substring's final join back — measured 0.4 s fake vs
# ~10 s honest at 10×, BENCH_TREND r6), while the noop sink consumes
# every column of every row.
EXTENDED_NOOP = [
    "dedup_exact_substring",
    "docs_repetition_signals",
    "dedup_keep_best",
    "dedup_minhash_verified",
    # r8: the end-to-end curation pipeline — the single most
    # representative number for the LLM-pipeline stack.
    "curation_funnel_report",
    # r9: the heaviest new text kernel (two tokenize passes + the
    # in-row pair fold) — tracked so regressions in the tokenize /
    # basket shapes show up in the round artifact.
    "token_collocations",
]


# A 1-min load average above this at measurement START means another
# workload is competing for the same cores — the numbers will be
# load-inflated (r11's committed artifact ran at la 7-10 and read +6.5%
# on UNCHANGED plans). The warning is embedded in the artifact itself
# so a loaded run can never silently become the round's number.
LA_WARN_THRESHOLD = 2.0


def main() -> None:
    from utility_service_areas_spark.plans.registry import all_queries
    from utility_service_areas_spark.session import build_session

    la_start = [round(x, 2) for x in os.getloadavg()]

    spark = build_session("usa-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/session on the smallest SF so we measure the query,
    # not session startup.
    qs[names[0]](spark, "/root/testdata/sf0.001").count()
    # r17 measurement fix (declared in OPTIMIZATION_r17.md, old numbers
    # kept there): also warm the Python worker pool — daemon spawn +
    # Arrow serializer init is SESSION infrastructure, and before this
    # the first Python-touching query absorbed the entire spin-up
    # (geo_point_in_polygon, the set's one Arrow-kernel query, carried
    # ~1.5-1.7 s of pool startup at every core count). Same warm-up
    # philosophy as the line above, same tiny SF, timings untouched.
    if "geo_point_in_polygon" in qs:
        qs["geo_point_in_polygon"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0
    extended: dict[str, float] = {}
    for name in (n for n in EXTENDED_NOOP if n in qs):
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total",
        # value stays the 14-query headline total (count()
        # convention) — the series comparable to the r1
        # de-facto baseline; the noop-forced extended set is
        # reported alongside, not summed in.
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extended_noop": extended,
        "sf": float(sf),
        # 1/5/15-min load averages at measurement end: lets a
        # reader tell an idle-band artifact from a load-inflated
        # one (r9's committed number was ~10% load-inflated and
        # only BENCH_TREND prose recorded why).
        "la": [round(x, 2) for x in os.getloadavg()],
        "la_start": la_start,
    }
    if la_start[0] > LA_WARN_THRESHOLD:
        out["la_warning"] = (
            f"1-min load {la_start[0]} > {LA_WARN_THRESHOLD} at start: "
            "timings are load-inflated; re-run idle before citing"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
