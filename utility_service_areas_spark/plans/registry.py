"""Query registry: every operator from SURVEY.md §2 registers a named
(spark_fn, oracle_sql) pair here; __spark_entry__.py exposes them to
the driver.

Conventions (see SURVEY.md §6):
- Every computed column is aliased identically in the Spark plan and
  the DuckDB oracle (the driver sorts columns by name before hashing).
- Integer-like computed columns are cast to BIGINT on both sides.
- Money/float aggregates are compared as cents-bigint
  (CAST(ROUND(sum*100) AS BIGINT)) so JVM-vs-DuckDB summation order
  can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def _ordered() -> dict[str, QuerySpec]:
    """Registry in driver-walk order: `_DRIVER_PRIORITY` names first
    (the verification driver attests a bounded prefix per round, so the
    prefix must hold the queries with no green row yet), then everything
    else in module-load order."""
    prio = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(_DRIVER_PRIORITY)]
    return {n: REGISTRY[n] for n in (*prio, *rest)}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {k: v.fn for k, v in _ordered().items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in _ordered().items() if v.oracle is not None}


_LOADED = False


# Module load order == registry iteration order == the order the
# verification driver walks queries. Families whose driver rows were
# missing in round 1 (analytics/tpch/etl/multimodal) load first so a
# time-budgeted driver pass reaches them; the slow dedup/geo families
# load last. Every module is first-party and REQUIRED — an import
# failure must crash loudly, not silently shrink the registry.
# The prefix is rotated each round to exactly the driver's 50-row
# attestation budget: red rows first, then the stalest-attested keys,
# then keys whose definitions were edited this round.
_DRIVER_PRIORITY = (
    # Round-15 rotation (VERDICT r14 task #1: close the r8 tail for
    # good): exactly 50 names = the driver's attestation budget.
    # No red rows in r14 (50/50 green, sixth clean sample). Staleness
    # computed from the union of CORRECTNESS_r01-r14 (never from
    # comments). The three oracle-less rows-only sketches stay
    # excluded (err:no_oracle burns a slot) but ARE re-attested in the
    # local ritual gate each round (tools/check_oracle.py).
    # 1) never-attested keys — new this round
    "dedup_suffix_splice",          # new in r15 (#262)
    "curation_funnel_classifier",   # new in r15 (#263)
    "abtest_mann_whitney",          # new in r15 (#264)
    "events_cusum_changepoint",     # new in r15 (#265)
    "orders_kruskal_wallis",        # new in r15 (#266)
    # 2) the nine r8-stale keys (the entire remaining r8 tail — after
    #    this round no sql-oracled key's newest driver row is < r10)
    "supplier_balance_rank_dist",
    "supplier_daily_running_revenue",
    "sync_status_case",
    "top3_orders_per_customer",
    "top_revenue_orders",
    "two_digit_year_fix",
    "unshipped_order_revenue",
    "user_first_last_event",
    "value_percentiles",
    # 3) 36 of the 50 r10-stale keys, alphabetical (three slots
    #    yielded to the late r15 additions #264-#266 — never-attested
    #    beats stale-green per slot). The 14-key remainder heads the
    #    r16 rotation: geo_union_overlap_area, geo_viewport_query,
    #    histogram_value_quantiles,
    #    kmeans_cluster_quality, orders_daily_ewma,
    #    orders_daily_gapfill, orders_pareto_front,
    #    part_abc_classification, revenue_benford_audit,
    #    revenue_bootstrap_ci, simhash_hamming_histogram,
    #    source_length_drift, token_collocations,
    #    tokenizer_vocab_coverage.
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "cms_token_counts",
    "curation_funnel_by_source",
    "curation_funnel_report",
    "data_quality_audit",
    "dedup_cdc_clusters",
    "dedup_cluster_density",
    "dedup_clusters",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    "docs_cdc_chunks",
    "docs_shard_manifest",
    "embedding_matryoshka_recall",
    "embedding_pca_map",
    "embedding_pca_project",
    "event_audience_overlap",
    "event_robust_outliers",
    "events_asof_tolerance",
    "events_burst_detection",
    "geo_area_rank",
    "geo_bbox_centroid",
    "geo_combine_multipolygon",
    "geo_dissolve_true_union",
    "geo_knn_areas",
    "geo_make_valid",
    "geo_morton_order",
    "geo_nearest_area",
    "geo_plss_cells",
    "geo_shapefile_pip",
    "geo_shapefile_roundtrip",
    "geo_simplify",
    "geo_union_grid_area",
)

_PLAN_MODULES = (
    "relational_queries",
    "analytics_queries",
    "tpch_queries",
    "etl_queries",
    "pipeline_queries",
    "multimodal_queries",
    "event_queries",
    "text_queries",
    "ann_queries",
    "dedup_queries",
    "geo_queries",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    No try/except: a broken plan module would otherwise silently drop
    its whole query family from queries() AND oracle_sql(), shrinking
    the correctness gate with no failure signal.
    """
    global _LOADED
    if _LOADED:
        return
    for mod in _PLAN_MODULES:
        __import__(f"utility_service_areas_spark.plans.{mod}")
    _LOADED = True
