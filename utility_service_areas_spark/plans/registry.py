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
    # Round-9 rotation (VERDICT r8 tasks 2, 3): exactly 50 names =
    # the driver's per-round attestation budget. No red rows in r8.
    # The three oracle-less rows-only sketches (approx_distinct_users,
    # tdigest_value_quantiles, heavy_hitter_tokens) are EXCLUDED —
    # they can only return err:no_oracle and would burn a slot
    # (VERDICT r8 "What's wrong" #2).
    # 1) keys whose plan was edited this round (stage-4 two-phase
    #    salted quota; 1-NN map-only retrofit; oracle hashes unchanged
    #    at 3 SFs) (3)
    "curation_funnel_report",
    "curation_funnel_by_source",
    "geo_nearest_area",
    # 2) new r9 keys — first-ever attestation (filled as they land;
    #    each displaces the tail r6 key so the budget stays 50)
    "geo_shapefile_roundtrip",
    "dedup_cluster_density",
    "cms_token_counts",
    "docs_shard_manifest",
    "ann_pq_topk",
    "embedding_matryoshka_recall",
    "ann_ivfpq_topk",
    "tokenizer_vocab_coverage",
    "ann_ivfpq_residual_topk",
    "docs_cdc_chunks",
    "dedup_cdc_clusters",
    "geo_shapefile_pip",
    "embedding_pca_project",
    "embedding_pca_map",
    "histogram_value_quantiles",
    "event_robust_outliers",
    "orders_daily_gapfill",
    "event_audience_overlap",
    "revenue_bootstrap_ci",
    "orders_pareto_front",
    "events_asof_tolerance",
    "kmeans_cluster_quality",
    "geo_knn_areas",
    "orders_daily_ewma",
    "data_quality_audit",
    "source_length_drift",
    "simhash_hamming_histogram",
    "revenue_benford_audit",
    "part_abc_classification",
    "token_collocations",
    "events_burst_detection",
    # (r9 new keys past the 50-slot budget — first attestation
    #  deferred to r10: nation_supplier_hhi,
    #  signup_to_purchase_latency, customer_k_anonymity,
    #  user_daily_journey_match, customers_all_quarters_1996,
    #  customer_order_streaks, ann_ivf_probe_recall,
    #  hll_audience_overlap, dedup_threshold_sweep,
    #  seq_len_packing_sweep, ann_lsh_plane_sweep,
    #  orders_winsorized_stats)
    # 3) the 16 keys whose newest driver row is r5 — the whole stale
    #    tail drains this round (16)
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "doc_fingerprint",
    "geo_area_rank",
    "geo_bbox_centroid",
    "geo_combine_multipolygon",
    "geo_dissolve_true_union",
    "geo_make_valid",
    "geo_morton_order",
    "geo_plss_cells",
    "geo_simplify",
    "geo_union_grid_area",
    "geo_union_overlap_area",
    "geo_viewport_query",
    # 4) r6-stale keys: 0 fit this round — ALL deferred to r10
    #    (in SURVEY order: text_tfidf_top_term,
    #    orders_with_late_items,
    #    customer_order_distribution,
    #    dormant_high_balance_customers,
    #    order_status_priority_cube,
    #    supplier_ship_gap_stats,
    #    customer_retention_setops,
    #    embedding_kmeans_assign,
    #    small_lot_revenue_by_brand,
    #    geo_pip_grid_cells,
    #    geo_overlap_grid_cells,
    #    docs_repetition_signals, domain_quota_sample,
    #    dedup_exact_substring, event_anomaly_zscore,
    #    customer_rfm_segments, embedding_pair_histogram,
    #    dedup_keep_best, hll_registers_users, user_session_stats,
    #    order_backlog_timeseries, geo_grid_density,
    #    lang_id_confusion, events_value_quartiles,
    #    supplier_count_by_part_type, nation_trade_volume,
    #    customers_above_avg_spend, max_size_parts_per_brand,
    #    text_clean, ann_ivf_topk, text_top_tokens,
    #    stratified_sample, events_json_extract, events_sessionize,
    #    events_latest_per_user, events_tumbling_agg, text_token_count,
    #    text_quality_score, text_lang_id, ann_lsh_topk,
    #    ann_cosine_topk, dedup_embedding_cosine, dedup_ngram_jaccard,
    #    geo_overlap_pairs, geo_point_in_polygon)
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
