"""The curation funnel as a PUBLISHED pipeline artifact.

`plans/service_areas.py` exports the reference pipeline's GeoJSON;
this is the equivalent operational artifact for the LLM-curation side
(VERDICT r8 task 7): one CLI invocation writes the run report a
100 TB curation job publishes —

  <out>/funnel_global/      5-row (stage, docs, tokens) funnel
  <out>/funnel_by_source/   the (source, stage) dashboard table
  <out>/mixing_weights/     sqrt-temperature sampling weights
  <out>/_SUMMARY.json       driver-side manifest (stage totals,
                            row counts, survival rate)

The three tables are the exact frames of the value-oracled registry
queries #158/#163/#153 — the report never re-derives logic; the
expensive stage pipeline (`_funnel_stage_frame`) runs ONCE and both
funnel aggregations read its lineage-cut result.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def write_curation_report(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    fmt: str = "parquet",
) -> dict:
    """Write the three report tables + _SUMMARY.json under ``out_dir``
    and return the summary dict. ``fmt`` is "parquet" or "jsonl"
    (spark json writer — one doc per line, the corpus-interchange
    format). The summary is written driver-side with plain open() —
    on a cluster the out_dir would be a shared filesystem mount; the
    table writes themselves go through the Spark writer and work on
    any Hadoop-compatible path."""
    from utility_service_areas_spark.plans.text_queries import (
        _FUNNEL_STACK,
        _funnel_agg_cols,
        _funnel_stage_frame,
        source_mixing_weights,
    )

    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")

    frame = _funnel_stage_frame(spark, sf_dir)  # lineage-cut: built once
    funnel_global = frame.agg(*_funnel_agg_cols()).select(F.expr(_FUNNEL_STACK))
    funnel_by_source = frame.groupBy("source").agg(*_funnel_agg_cols()).select(
        "source", F.expr(_FUNNEL_STACK)
    )
    weights = source_mixing_weights(spark, sf_dir)

    def write(df, name: str) -> int:
        path = os.path.join(out_dir, name)
        w = df.write.mode("overwrite")
        if fmt == "parquet":
            w.parquet(path)
        else:
            w.json(path)
        return path

    write(funnel_global, "funnel_global")
    write(funnel_by_source, "funnel_by_source")
    write(weights, "mixing_weights")

    stages = {
        r.stage: {"n_docs": r.n_docs, "n_tokens": r.n_tokens}
        for r in funnel_global.collect()  # 5 rows — driver state is tiny
    }
    raw, kept = stages["raw"], stages["source_quota"]
    summary = {
        "sf_dir": sf_dir,
        "format": fmt,
        "stages": stages,
        "n_sources": funnel_by_source.select("source").distinct().count(),
        "survival_docs_micros": (
            kept["n_docs"] * 1_000_000 // raw["n_docs"] if raw["n_docs"] else 0
        ),
        "survival_tokens_micros": (
            kept["n_tokens"] * 1_000_000 // raw["n_tokens"] if raw["n_tokens"] else 0
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
