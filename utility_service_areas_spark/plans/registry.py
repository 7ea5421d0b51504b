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
    # Round-16 rotation (VERDICT r15 tasks #1 and #7): exactly 50
    # names = the driver's attestation budget. No red rows in r15
    # (50/50 green, seventh clean sample). Staleness computed from
    # the union of CORRECTNESS_r01-r15 (never from comments) —
    # newest-row histogram after r15: r10×14, r11×50, then r12+.
    # The three oracle-less rows-only sketches stay excluded
    # (err:no_oracle burns a slot) but ARE re-attested in the local
    # ritual gate each round (tools/check_oracle.py). The boundary
    # cohort (r11, 50 keys) is split alphabetically; the split is
    # mechanically pinned against the CORRECTNESS union by
    # tests/test_registry.py::test_rotation_matches_correctness_union
    # via `_NEXT_ROUND_REMAINDER` below.
    # 1) never-attested keys — new this round
    "logreg_online_sweep_refresh",  # new in r16 (#267)
    # 2) the entire 14-key r10-stale remainder (named in r15's
    #    rotation comment; after this round's driver pass no
    #    sql-oracled key's newest driver row is older than r11)
    "geo_union_overlap_area",
    "geo_viewport_query",
    "histogram_value_quantiles",
    "kmeans_cluster_quality",
    "orders_daily_ewma",
    "orders_daily_gapfill",
    "orders_pareto_front",
    "part_abc_classification",
    "revenue_benford_audit",
    "revenue_bootstrap_ci",
    "simhash_hamming_histogram",
    "source_length_drift",
    "token_collocations",
    "tokenizer_vocab_coverage",
    # 3) 35 of the 50 r11-stale keys, alphabetical (one slot yielded
    #    to #267 — never-attested beats stale-green per slot); the
    #    15-key remainder is `_NEXT_ROUND_REMAINDER` (r17's head).
    "ann_cosine_topk",
    "ann_ivf_probe_recall",
    "ann_ivf_topk",
    "ann_lsh_plane_sweep",
    "ann_lsh_topk",
    "bpe_compression_sweep",
    "customer_k_anonymity",
    "customer_order_streaks",
    "customer_rfm_segments",
    "customers_all_quarters_1996",
    "dataset_split_assign",
    "dedup_embedding_cosine",
    "dedup_exact_substring",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "dedup_threshold_sweep",
    "docs_repetition_signals",
    "domain_quota_sample",
    "embedding_kmeans_assign",
    "embedding_pair_histogram",
    "event_anomaly_zscore",
    "events_hourly_autocorr",
    "events_variant_stats",
    "geo_grid_density",
    "geo_overlap_grid_cells",
    "geo_overlap_pairs",
    "geo_pip_grid_cells",
    "geo_point_in_polygon",
    "hll_audience_overlap",
    "kmv_customer_overlap",
    "kmv_distinct_customers",
    "kmv_union_distinct",
    "lang_id_confusion",
    "multimodal_features",
    "nation_supplier_hhi",
)

# The stalest-attested keys that did NOT fit this round's 50-slot
# prefix: they head the NEXT round's rotation. Kept as data (not a
# comment) so tests/test_registry.py can recompute the stale pool from
# the CORRECTNESS_r*.json union and assert prefix ∪ remainder equals
# it exactly — a rotation note can never drift from the data again
# (VERDICT r15 task #3).
_NEXT_ROUND_REMAINDER = (
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
