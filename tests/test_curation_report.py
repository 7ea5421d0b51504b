"""The published curation-funnel artifact (CLI `funnel` target): the
written tables must equal the value-oracled registry queries row for
row, and the _SUMMARY.json manifest must be readable and consistent.
"""

from __future__ import annotations

import json
import os

from tests.conftest import SMOKE_SF


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_written_report_matches_registered_queries(spark, tmp_path):
    from utility_service_areas_spark.plans.curation_report import (
        write_curation_report,
    )
    from utility_service_areas_spark.plans.registry import all_queries

    out = str(tmp_path / "report")
    summary = write_curation_report(spark, SMOKE_SF, out)

    qs = all_queries()
    want_global = _rows(qs["curation_funnel_report"](spark, SMOKE_SF))
    want_src = _rows(qs["curation_funnel_by_source"](spark, SMOKE_SF))
    want_w = _rows(qs["source_mixing_weights"](spark, SMOKE_SF))

    got_global = _rows(
        spark.read.parquet(os.path.join(out, "funnel_global")).select(
            "stage_idx", "stage", "n_docs", "n_tokens"
        )
    )
    got_src = _rows(
        spark.read.parquet(os.path.join(out, "funnel_by_source")).select(
            "source", "stage_idx", "stage", "n_docs", "n_tokens"
        )
    )
    got_w = _rows(
        spark.read.parquet(os.path.join(out, "mixing_weights")).select(
            "source",
            "n_docs",
            "n_tokens",
            "raw_share_micros",
            "weight_micros",
            "upweighted",
        )
    )
    assert got_global == want_global
    assert got_src == want_src
    assert got_w == want_w

    manifest = json.load(open(os.path.join(out, "_SUMMARY.json")))
    assert manifest["stages"]["raw"]["n_docs"] > 0
    assert (
        manifest["stages"]["source_quota"]["n_docs"]
        <= manifest["stages"]["minhash_dedup"]["n_docs"]
        <= manifest["stages"]["raw"]["n_docs"]
    )
    assert 0 < manifest["survival_docs_micros"] <= 1_000_000
    assert manifest == summary


def test_cli_funnel_jsonl(spark, tmp_path, capsys):
    from utility_service_areas_spark.__main__ import main

    out = str(tmp_path / "report_jsonl")
    rc = main(["funnel", "--sf-dir", SMOKE_SF, "--out", out, "--format", "jsonl"])
    assert rc == 0
    assert "kept" in capsys.readouterr().out
    # jsonl round-trips through the spark json reader, schema-complete
    back = spark.read.json(os.path.join(out, "funnel_by_source"))
    assert {"source", "stage_idx", "stage", "n_docs", "n_tokens"} <= set(back.columns)
    assert back.count() == 5 * back.select("source").distinct().count()
    assert os.path.exists(os.path.join(out, "_SUMMARY.json"))


def test_bad_format_rejected(spark, tmp_path):
    import pytest

    from utility_service_areas_spark.plans.curation_report import (
        write_curation_report,
    )

    with pytest.raises(ValueError, match="fmt"):
        write_curation_report(spark, SMOKE_SF, str(tmp_path / "x"), fmt="csv")
