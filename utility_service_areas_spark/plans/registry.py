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
    # Round-13 rotation (VERDICT r12 task #2: drain the r7 attestation
    # tail): exactly 50 names = the driver's per-round attestation
    # budget. No red rows in r12 (50/50 green, fourth clean sample).
    # The three oracle-less rows-only sketches AND the oracle-less
    # xxhash64 twin (revenue_bootstrap_ci_fast) stay excluded — they'd
    # burn a slot on err:no_oracle/rows-only.
    # 1) the never-attested r13 keys — first-ever attestation
    "ann_ivfpq_search_persisted",
    "docs_model_quality_scores",
    "text_bm25_search_persisted",
    "docs_gopher_quality_flags",
    "text_naive_bayes_source",
    "docs_dsir_importance",
    "dedup_cc_twostar",
    "trade_graph_hits",
    "abtest_cuped_adjusted",
    "orders_theil_sen_trend",
    "events_exact_quartiles_nosort",
    "source_kl_drift",
    "versioned_merge_snapshot",
    "quality_pair_mining",
    "docs_curriculum_rank",
    "abtest_srm_check",
    "user_activity_gini",
    "part_brand_type_chi2",
    "orders_seasonality_index",
    "vocab_coverage_sweep",
    "corpus_heaps_fit",
    "events_poisson_rate_ci",
    # 2) 28 of the 35 r7-stale keys (newest green driver row is r7 —
    #    the oldest attestations left; computed from CORRECTNESS_r01-
    #    r12). Seven r7 keys yield their slots to the 22 first-ever
    #    r13 attestations (never-attested > stale-green per slot) and
    #    head the r14 rotation: ann_quantized_topk,
    #    docs_unigram_surprisal, dedup_keep_best_quality,
    #    embedding_centroid_by_label, ann_ivf_sqrtn_topk,
    #    corpus_clean_sample, token_count_histogram.
    "flagship_service_area_report",
    "filter_tag_entities",
    "latest_update_per_entity",
    "earliest_year_per_entity",
    "dedup_first_per_key",
    "regex_extract_fields",
    "large_volume_orders",
    "promo_revenue_share_by_month",
    "nation_market_share_inputs",
    "disjunctive_bracket_revenue",
    "order_fulfillment_latency",
    "simple_revenue_delta",
    "returned_item_report",
    "profit_by_nation_year",
    "part_revenue_concentration",
    "top_revenue_supplier",
    "excess_quantity_suppliers",
    "supplier_order_exclusivity",
    "merge_upsert_customers",
    "salted_hot_key_join",
    "pivot_status_by_year",
    "unpivot_part_metrics",
    "weighted_sample_orders",
    "fuzzy_match_part_names",
    "scd2_customer_history",
    "bloom_new_customer_orders",
    "reservoir_sample_docs",
    "docs_training_filter",
    # r7/r8-stale keys that don't fit the 50 budget this round (next
    # rotation's head): the seven r7 keys named above, then the r8
    # block in module-load order: two_digit_year_fix, enrich_join_dims,
    # anti_join_missing,
    # patch_override_join, sync_status_case,
    # group_combine_collect, concat_order_text,
    # agg_stats_by_group, top_revenue_orders,
    # sentinel_date_imputation,
    # top3_orders_per_customer, kml_description_parse,
    # geometry_currency_check,
    # chronology_enriched, events_asof_attribution,
    # events_in_promo_windows, agg_rollup_region_nation,
    # value_percentiles, events_moving_window, profile_orders, and the
    # remaining 27 r8 rows.
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
