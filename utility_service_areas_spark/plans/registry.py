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
    # Round-8 rotation (VERDICT r7 tasks 1, 2, 4): exactly 50 names =
    # the driver's per-round attestation budget.
    # 1) the two r7 red rows, re-attested first after the
    #    canonicalization-surface fixes (HUGEINT sums cast to BIGINT;
    #    codes array comma-joined) (2)
    "source_curation_profile",
    "embedding_quantize_int8",
    # 2) the 14 new r8 keys — first-ever attestation
    "semantic_dedup_keep",
    "dedup_quote_containment",
    "dedup_graph_triangles",
    "source_mixing_weights",
    "embedding_outlier_flags",
    "market_basket_pairs",
    "deletion_cascade_manifest",
    "join_key_skew_profile",
    "curation_funnel_report",
    "semantic_dedup_sqrtn",
    "orders_rollup_incremental",
    "dataset_snapshot_diff",
    "minhash_estimator_quality",
    "curation_funnel_by_source",
    # 3) the 3 keys whose newest driver row is r4 (deferred from r7)
    "min_cost_supplier_per_part",
    "unshipped_order_revenue",
    "priority_counts_by_returnflag",
    # 4) 31 of the 47 keys whose newest driver row is r5 (deferred to
    #    r9: dedup_exact_docs, dedup_minhash_lsh, dedup_simhash,
    #    dedup_clusters, and the geo tail incl. geo_area_rank
    #    — geo_plss_cells, geo_union_grid_area, geo_viewport_query,
    #    geo_make_valid, geo_combine_multipolygon, geo_union_overlap_
    #    area, geo_dissolve_true_union, geo_simplify, geo_morton_order
    #    — and geo_bbox_centroid and doc_fingerprint defer to r9 to
    #    hold the 50 budget)
    "two_digit_year_fix",
    "enrich_join_dims",
    "anti_join_missing",
    "patch_override_join",
    "sync_status_case",
    "group_combine_collect",
    "concat_order_text",
    "agg_stats_by_group",
    "top_revenue_orders",
    "sentinel_date_imputation",
    "top3_orders_per_customer",
    "kml_description_parse",
    "geometry_currency_check",
    "chronology_enriched",
    "events_asof_attribution",
    "events_in_promo_windows",
    "agg_rollup_region_nation",
    "value_percentiles",
    "events_moving_window",
    "profile_orders",
    "approx_distinct_users",
    "supplier_balance_rank_dist",
    "user_first_last_event",
    "daily_new_users_cumulative",
    "supplier_daily_running_revenue",
    "event_funnel_conversion",
    "cohort_retention",
    "rolling_7d_active_users",
    "qty_price_covariance_components",
    "event_type_transitions",
    "regional_order_volume",
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
