"""The published tuning-lever artifact (CLI `tuning` target): written
tables must equal the value-oracled registry queries row for row; the
_SUMMARY.json operating points must follow the documented knob rules.
"""

from __future__ import annotations

import json
import os

from tests.conftest import SMOKE_SF

_TABLE_TO_QUERY = {
    "dedup_thresholds": "dedup_threshold_sweep",
    "ivf_probes": "ann_ivf_probe_recall",
    "lsh_planes": "ann_lsh_plane_sweep",
    "seq_len_packing": "seq_len_packing_sweep",
    "matryoshka_dims": "embedding_matryoshka_recall",
    "bpe_compression": "bpe_compression_sweep",
    "minhash_bbit": "minhash_bbit_tradeoff",
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_written_tuning_matches_registered_queries(spark, tmp_path):
    from utility_service_areas_spark.plans.registry import all_queries
    from utility_service_areas_spark.plans.tuning_report import (
        write_tuning_report,
    )

    out = str(tmp_path / "tuning")
    summary = write_tuning_report(spark, SMOKE_SF, out)

    qs = all_queries()
    for table, qname in _TABLE_TO_QUERY.items():
        want_df = qs[qname](spark, SMOKE_SF)
        got = _rows(
            spark.read.parquet(os.path.join(out, table)).select(
                *want_df.columns
            )
        )
        assert got == _rows(want_df), f"{table} drifted from {qname}"

    manifest = json.load(open(os.path.join(out, "_SUMMARY.json")))
    assert manifest == summary

    # Operating-point rules replayed against the published rows.
    probes = manifest["ivf_probes"]["rows"]
    best = max(r["recall_micros"] for r in probes)
    assert manifest["ivf_probes"]["recommended_probe"] == min(
        r["probe"] for r in probes if r["recall_micros"] >= best - 100_000
    )
    matry = manifest["matryoshka_dims"]["rows"]
    full = matry[-1]["recall_micros"]
    ok = [
        r["trunc_dim"]
        for r in matry
        if r["recall_micros"] * 1_000_000 >= 900_000 * full
    ]
    assert manifest["matryoshka_dims"]["recommended_dim"] == min(ok)
    packing = manifest["seq_len_packing"]["rows"]
    assert manifest["seq_len_packing"]["recommended_seq_len"] == min(
        packing,
        key=lambda r: (
            r["tokens_truncated"] + r["tail_waste_tokens"],
            r["seq_len"],
        ),
    )["seq_len"]
    bpe = manifest["bpe_compression"]["rows"]
    assert bpe == sorted(bpe, key=lambda r: r["merge_round"])
    floor = max(bpe[0]["total_symbols"] * 5_000 // 1_000_000, 1)
    want_pick = 0
    for prev, cur in zip(bpe, bpe[1:]):
        if prev["total_symbols"] - cur["total_symbols"] >= floor:
            want_pick = cur["merge_round"]
    assert manifest["bpe_compression"]["recommended_merge_rounds"] == want_pick
    bbit = manifest["minhash_bbit"]["rows"]
    baseline = next(r["mean_abs_err_micros"] for r in bbit if r["bits"] == 64)
    ok_bits = [
        r["bits"]
        for r in bbit
        if r["bits"] != 64
        and r["mean_abs_err_micros"] <= baseline + 30_000
    ]
    assert manifest["minhash_bbit"]["recommended_bits"] == (
        min(ok_bits) if ok_bits else 64
    )


def test_cli_tuning_jsonl(spark, tmp_path, capsys):
    from utility_service_areas_spark.__main__ import main

    out = str(tmp_path / "tuning_jsonl")
    rc = main(["tuning", "--sf-dir", SMOKE_SF, "--out", out, "--format", "jsonl"])
    assert rc == 0
    assert "probe=" in capsys.readouterr().out
    back = spark.read.json(os.path.join(out, "ivf_probes"))
    assert {"probe", "recall_micros", "n_candidates"} <= set(back.columns)
