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
    # Round-14 rotation (VERDICT r13 task #1: drain the r7/r8
    # attestation tail): exactly 50 names = the driver's per-round
    # attestation budget. No red rows in r13 (50/50 green, fifth clean
    # sample). Staleness is computed from the union of
    # CORRECTNESS_r01-r13 (never from comments). The three oracle-less
    # rows-only sketches stay excluded (they'd burn a slot on
    # err:no_oracle) but ARE re-attested in the local ritual gate each
    # round (VERDICT r13 task #8, tools/check_oracle.py).
    # 1) never-attested keys — first-ever attestation beats stale-green
    "docs_quality_logreg_train",   # new in r14 (#259)
    "docs_logreg_pr_sweep",        # new in r14 (#260)
    "docs_logreg_calibration",     # new in r14 (#261)
    "revenue_bootstrap_ci_fast",   # newly oracled in r14 (task #2)
    # 2) edited-this-round key: same output, but the backing store was
    #    rewritten (BM25 v2 segments) — re-attest the changed machinery
    "text_bm25_search_persisted",
    # 3) the seven r7-stale keys deferred from r13 (named there)
    "ann_quantized_topk",
    "docs_unigram_surprisal",
    "dedup_keep_best_quality",
    "embedding_centroid_by_label",
    "ann_ivf_sqrtn_topk",
    "corpus_clean_sample",
    "token_count_histogram",
    # 4) 38 of the 47 sql-oracled r8-stale keys (newest green driver
    #    row is r8), alphabetical (two slots yielded to the late r14
    #    additions #260/#261 — never-attested > stale-green per slot).
    #    The 9-key remainder heads the r15 rotation:
    #    supplier_balance_rank_dist, supplier_daily_running_revenue,
    #    sync_status_case, top3_orders_per_customer,
    #    top_revenue_orders, two_digit_year_fix,
    #    unshipped_order_revenue, user_first_last_event,
    #    value_percentiles.
    "agg_rollup_region_nation",
    "agg_stats_by_group",
    "anti_join_missing",
    "chronology_enriched",
    "cohort_retention",
    "concat_order_text",
    "daily_new_users_cumulative",
    "dataset_snapshot_diff",
    "dedup_graph_triangles",
    "dedup_quote_containment",
    "deletion_cascade_manifest",
    "embedding_outlier_flags",
    "embedding_quantize_int8",
    "enrich_join_dims",
    "event_funnel_conversion",
    "event_type_transitions",
    "events_asof_attribution",
    "events_in_promo_windows",
    "events_moving_window",
    "geometry_currency_check",
    "group_combine_collect",
    "join_key_skew_profile",
    "kml_description_parse",
    "market_basket_pairs",
    "min_cost_supplier_per_part",
    "minhash_estimator_quality",
    "orders_rollup_incremental",
    "patch_override_join",
    "priority_counts_by_returnflag",
    "profile_orders",
    "qty_price_covariance_components",
    "regional_order_volume",
    "rolling_7d_active_users",
    "semantic_dedup_keep",
    "semantic_dedup_sqrtn",
    "sentinel_date_imputation",
    "source_curation_profile",
    "source_mixing_weights",
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
