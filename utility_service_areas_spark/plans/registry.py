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
# Queries with no green CORRECTNESS_r{N} row in any prior round (r1+r2
# drivers attested 80/124; VERDICT_r2 §Coverage lists these 44 as
# local-mirror-pass / pytest-only). They are hoisted to the front of
# the registry walk so the round-3 driver pass attests them; newly
# added round-3 queries are appended below them, keeping the prefix
# ≤ the driver's 50-row budget.
_DRIVER_PRIORITY = (
    # never-driver-verified, local mirror PASS (41)
    "merge_upsert_customers",
    "pivot_status_by_year",
    "unpivot_part_metrics",
    "salted_hot_key_join",
    "weighted_sample_orders",
    "fuzzy_match_part_names",
    "scd2_customer_history",
    "bloom_new_customer_orders",
    "docs_chunk_split",
    "docs_pack_sequences",
    "text_redact_pii",
    "docs_benchmark_overlap",
    "docs_block_dedup",
    "reservoir_sample_docs",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_dedup_bytes",
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
    "min_cost_supplier_per_part",
    "unshipped_order_revenue",
    "priority_counts_by_returnflag",
    "docs_training_filter",
    "token_count_histogram",
    "corpus_clean_sample",
    "docs_unigram_surprisal",
    "embedding_centroid_by_label",
    "geo_union_overlap_area",
    "geo_dissolve_true_union",
    "geo_simplify",
    "geo_morton_order",
    # never-driver-verified, declared rows-only (3)
    "embedding_kmeans_assign",
    "tdigest_value_quantiles",
    "heavy_hitter_tokens",
    # round-3 additions (keep total prefix ≤ 50)
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
