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
    # Round-17 rotation (VERDICT r16 task #1; round-opening ritual —
    # this edit is the FIRST commit of the round so the rotation pin
    # tests/test_registry.py::test_rotation_matches_correctness_union
    # is green the whole round). No red rows in r16 (50/50 green).
    # Staleness computed from the union of CORRECTNESS_r01-r16 (never
    # from comments) — newest-row histogram after r16: r11×15 (the
    # promised r16 `_NEXT_ROUND_REMAINDER`), then r12×50. The three
    # oracle-less rows-only sketches stay excluded (err:no_oracle
    # burns a slot) but ARE re-attested in the local ritual gate each
    # round (tools/check_oracle.py). The boundary cohort (r12, 50
    # keys) is split alphabetically; the split is mechanically pinned
    # via `_NEXT_ROUND_REMAINDER` below.
    # 1) never-attested keys — new this round
    "medallion_stream_pipeline",  # new in r17 (#268)
    # 2) the entire 15-key r11-stale remainder (named as data in r16)
    "orders_daily_ohlc",
    "orders_weekly_ohlc",
    "orders_winsorized_stats",
    "seq_len_packing_sweep",
    "shard_zonemap_prune",
    "signup_to_purchase_latency",
    "stratified_sample",
    "text_clean",
    "text_lang_id",
    "text_quality_score",
    "text_tfidf_top_term",
    "text_token_count",
    "text_top_tokens",
    "tokenizer_bpe_merges",
    "user_daily_journey_match",
    # 3) 34 of the 50 r12-stale keys, alphabetical (one slot yielded
    #    to #268 — never-attested beats stale-green per slot); the
    #    16-key remainder is `_NEXT_ROUND_REMAINDER` (r18's head).
    "abtest_two_proportion",
    "ann_ivf_quantized_topk",
    "ann_mmr_rerank",
    "cdc_latest_version_merge",
    "corpus_zipf_fit",
    "customer_order_distribution",
    "customer_retention_setops",
    "customers_above_avg_spend",
    "dedup_incremental_ingest",
    "dedup_minhash_verified",
    "dedup_suffix_lrs",
    "docs_benchmark_overlap",
    "docs_bigram_surprisal",
    "docs_block_dedup",
    "docs_chunk_split",
    "docs_novelty_profile",
    "docs_pack_sequences",
    "dormant_high_balance_customers",
    "embedding_knn_graph",
    "events_json_extract",
    "events_latest_per_user",
    "events_sessionize",
    "events_tumbling_agg",
    "events_value_quartiles",
    "geo_quadkey_pyramid",
    "geo_simplify_vw",
    "hll_registers_users",
    "max_size_parts_per_brand",
    "minhash_bbit_tradeoff",
    "multimodal_aspect_buckets",
    "multimodal_decode_meta",
    "multimodal_dedup_bytes",
    "multimodal_frame_sample",
    "nation_trade_volume",
)

# The stalest-attested keys that did NOT fit this round's 50-slot
# prefix: they head the NEXT round's rotation. Kept as data (not a
# comment) so tests/test_registry.py can recompute the stale pool from
# the CORRECTNESS_r*.json union and assert prefix ∪ remainder equals
# it exactly — a rotation note can never drift from the data again
# (VERDICT r15 task #3).
_NEXT_ROUND_REMAINDER = (
    "order_backlog_timeseries",
    "order_status_priority_cube",
    "orders_ols_trend",
    "orders_with_late_items",
    "search_rrf_fusion",
    "small_lot_revenue_by_brand",
    "source_token_entropy",
    "supplier_count_by_part_type",
    "supplier_ship_gap_stats",
    "text_bm25_topk",
    "text_hashing_trick_features",
    "text_rake_keyphrases",
    "text_redact_pii",
    "trade_graph_lpa",
    "trade_graph_pagerank",
    "user_session_stats",
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
