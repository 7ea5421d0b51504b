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


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {k: v.fn for k, v in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in REGISTRY.items() if v.oracle is not None}


_LOADED = False


# Module load order == registry iteration order == the order the
# verification driver walks queries. Families whose driver rows were
# missing in round 1 (analytics/tpch/etl/multimodal) load first so a
# time-budgeted driver pass reaches them; the slow dedup/geo families
# load last. Every module is first-party and REQUIRED — an import
# failure must crash loudly, not silently shrink the registry.
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
