"""The data-quality audit as a PUBLISHED pipeline artifact.

Companion to plans/curation_report.py: one CLI invocation writes the
per-batch contract report a recurring 100 TB ingest publishes —

  <out>/rule_violations/   the (rule, n_violations, n_checked) table
  <out>/source_drift/      the per-source two-sample drift scores
  <out>/_SUMMARY.json      driver-side manifest (failed-rule list,
                           max drift source, pass/fail verdict)

Both tables are the exact frames of the value-oracled registry
queries #188 (data_quality_audit) and #189 (source_length_drift) —
the artifact never re-derives logic, so every published number is
covered by the driver's correctness gate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

# rules that must be exactly zero for the batch to pass; the business
# rule (weekend_orderdate) and the known-dirty temporal rule report
# but do not gate.
_GATING_RULES = (
    "null_custkey",
    "nonpositive_totalprice",
    "duplicate_orderkey",
    "orphan_custkey",
    "discount_out_of_range",
)
_DRIFT_ALERT_MILLI = 50_000  # chi2_milli above this flags a source


def write_audit_report(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    fmt: str = "parquet",
) -> dict:
    """Write both audit tables + _SUMMARY.json under ``out_dir`` and
    return the summary dict. Same contract as write_curation_report:
    table writes go through the Spark writer (any Hadoop-compatible
    path); the summary is a driver-side manifest over tiny frames
    (7 rules, |sources| drift rows)."""
    from utility_service_areas_spark.operators.dedup import lineage_cut
    from utility_service_areas_spark.plans.etl_queries import data_quality_audit
    from utility_service_areas_spark.plans.text_queries import source_length_drift

    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")

    # Each frame has TWO consumers (the table write and the summary
    # collect); without the cut the orphan anti-join and the drift
    # corpus aggregation would re-run per consumer (r9 code review).
    # Both frames are tiny (7 rules, |sources| rows) — the cut is free.
    rules = lineage_cut(data_quality_audit(spark, sf_dir))
    drift = lineage_cut(source_length_drift(spark, sf_dir))

    def write(df, name: str) -> str:
        path = os.path.join(out_dir, name)
        w = df.write.mode("overwrite")
        if fmt == "parquet":
            w.parquet(path)
        else:
            w.json(path)
        return path

    write(rules, "rule_violations")
    write(drift, "source_drift")

    rule_rows = {r.rule: (r.n_violations, r.n_checked) for r in rules.collect()}
    drift_rows = sorted(
        ((r.source, r.chi2_milli) for r in drift.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    failed = sorted(
        r for r in _GATING_RULES if rule_rows.get(r, (0, 0))[0] > 0
    )
    alerts = [s for s, c in drift_rows if c > _DRIFT_ALERT_MILLI]
    summary = {
        "sf_dir": sf_dir,
        "format": fmt,
        "rules": {
            r: {"n_violations": v, "n_checked": n}
            for r, (v, n) in sorted(rule_rows.items())
        },
        "gating_rules_failed": failed,
        "drift_top_source": drift_rows[0][0] if drift_rows else None,
        "drift_top_chi2_milli": drift_rows[0][1] if drift_rows else 0,
        "drift_alert_sources": alerts,
        "verdict": "pass" if not failed and not alerts else "fail",
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
