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
    # Round-12 rotation (VERDICT r11 task #2: drain the r6-stale
    # attestation tail): exactly 50 names = the driver's per-round
    # attestation budget. No red rows in r11 (50/50 green). The three
    # oracle-less rows-only sketches AND the oracle-less xxhash64 twin
    # (revenue_bootstrap_ci_fast) stay excluded — they'd burn a slot
    # on err:no_oracle/rows-only.
    # 1) the 18 new r12 keys — first-ever attestation
    "text_hashing_trick_features",
    "minhash_bbit_tradeoff",
    "cdc_latest_version_merge",
    "abtest_two_proportion",
    "text_bm25_topk",
    "dedup_suffix_lrs",
    "embedding_knn_graph",
    "multimodal_aspect_buckets",
    "docs_novelty_profile",
    "source_token_entropy",
    "text_rake_keyphrases",
    "geo_simplify_vw",
    "search_rrf_fusion",
    "trade_graph_lpa",
    "ann_mmr_rerank",
    "corpus_zipf_fit",
    "orders_ols_trend",
    "geo_quadkey_pyramid",
    # 2) ALL 19 remaining r6-stale keys (their newest green driver
    #    row is r6 — the oldest attestations in the repo)
    "hll_registers_users",
    "user_session_stats",
    "order_backlog_timeseries",
    "events_tumbling_agg",
    "events_sessionize",
    "events_latest_per_user",
    "events_json_extract",
    "events_value_quartiles",
    "supplier_count_by_part_type",
    "nation_trade_volume",
    "customers_above_avg_spend",
    "max_size_parts_per_brand",
    "orders_with_late_items",
    "customer_order_distribution",
    "dormant_high_balance_customers",
    "order_status_priority_cube",
    "supplier_ship_gap_stats",
    "customer_retention_setops",
    "small_lot_revenue_by_brand",
    # 3) 13 of the r7-stale tail — keys whose FAMILIES changed this
    #    round first (graph: LPA shares #145's edge construction;
    #    multimodal: aspect buckets joined the family; text/pipeline
    #    span machinery: novelty reuses #129's skeleton), then the
    #    heaviest r7 kernels
    "trade_graph_pagerank",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_dedup_bytes",
    "docs_chunk_split",
    "docs_pack_sequences",
    "docs_block_dedup",
    "docs_benchmark_overlap",
    "text_redact_pii",
    "docs_bigram_surprisal",
    "dedup_incremental_ingest",
    "dedup_minhash_verified",
    "ann_ivf_quantized_topk",
    # r7-stale keys that don't fit the 50 budget this round (next
    # rotation's head): fuzzy_match_part_names, scd2_customer_history,
    # reservoir_sample_docs,
    # bloom_new_customer_orders, flagship_service_area_report,
    # filter_tag_entities, latest_update_per_entity,
    # earliest_year_per_entity, dedup_first_per_key,
    # regex_extract_fields, merge_upsert_customers,
    # pivot_status_by_year, unpivot_part_metrics, salted_hot_key_join,
    # embedding_centroid_by_label, docs_training_filter,
    # token_count_histogram, corpus_clean_sample,
    # weighted_sample_orders, docs_unigram_surprisal,
    # large_volume_orders, promo_revenue_share_by_month,
    # nation_market_share_inputs, disjunctive_bracket_revenue,
    # order_fulfillment_latency, simple_revenue_delta,
    # returned_item_report, profit_by_nation_year,
    # part_revenue_concentration, top_revenue_supplier,
    # excess_quantity_suppliers, supplier_order_exclusivity,
    # dedup_keep_best_quality, ann_ivf_sqrtn_topk, ann_quantized_topk
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
