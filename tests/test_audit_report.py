"""The published data-quality audit artifact (CLI `audit` target):
written tables must equal the value-oracled registry queries row for
row; the _SUMMARY.json verdict must reflect the gating rules.
"""

from __future__ import annotations

import json
import os

from tests.conftest import SMOKE_SF


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_written_audit_matches_registered_queries(spark, tmp_path):
    from utility_service_areas_spark.plans.audit_report import write_audit_report
    from utility_service_areas_spark.plans.registry import all_queries

    out = str(tmp_path / "audit")
    summary = write_audit_report(spark, SMOKE_SF, out)

    qs = all_queries()
    want_rules = _rows(qs["data_quality_audit"](spark, SMOKE_SF))
    want_drift = _rows(qs["source_length_drift"](spark, SMOKE_SF))

    got_rules = _rows(
        spark.read.parquet(os.path.join(out, "rule_violations")).select(
            "rule", "n_violations", "n_checked"
        )
    )
    got_drift = _rows(
        spark.read.parquet(os.path.join(out, "source_drift")).select(
            "source", "n_a", "n_b", "chi2_milli"
        )
    )
    assert got_rules == want_rules
    assert got_drift == want_drift

    manifest = json.load(open(os.path.join(out, "_SUMMARY.json")))
    assert manifest == summary
    # this substrate is referentially clean but temporally dirty:
    # the gating rules pass while ship_before_order reports real hits
    assert manifest["gating_rules_failed"] == []
    assert manifest["rules"]["ship_before_order"]["n_violations"] > 0
    assert manifest["verdict"] == "pass"
    assert manifest["drift_top_chi2_milli"] >= 0


def test_cli_audit_jsonl(spark, tmp_path, capsys):
    from utility_service_areas_spark.__main__ import main

    out = str(tmp_path / "audit_jsonl")
    rc = main(["audit", "--sf-dir", SMOKE_SF, "--out", out, "--format", "jsonl"])
    assert rc == 0
    assert "verdict=pass" in capsys.readouterr().out
    back = spark.read.json(os.path.join(out, "rule_violations"))
    assert {"rule", "n_violations", "n_checked"} <= set(back.columns)
    assert back.count() == 7
    assert os.path.exists(os.path.join(out, "_SUMMARY.json"))


def test_audit_bad_format_rejected(spark, tmp_path):
    import pytest

    from utility_service_areas_spark.plans.audit_report import write_audit_report

    with pytest.raises(ValueError, match="fmt"):
        write_audit_report(spark, SMOKE_SF, str(tmp_path / "x"), fmt="csv")
