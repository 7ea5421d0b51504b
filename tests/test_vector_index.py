"""Persisted IVFPQ index lifecycle (operators/vector_index.py).

VERDICT r12 task #1: build once -> parquet artifacts -> search many;
incremental add against FROZEN codebooks (the FAISS add() contract);
manifest-last commit (a crashed build is never readable).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF

from utility_service_areas_spark.operators.vector_index import (
    MANIFEST_NAME,
    add_to_ivfpq_index,
    build_ivfpq_index,
    load_ivfpq_index,
    search_ivfpq_index,
)
from utility_service_areas_spark.sources.tables import load_table


def _emb(spark):
    return load_table(spark, SMOKE_SF, "embeddings")


def test_search_from_artifacts_row_identical_to_inline(spark, tmp_path):
    """The headline pin: build -> persist -> search-from-artifacts
    returns EXACTLY the rows of the inline ann_ivfpq_residual_topk
    (#172) over the same corpus — the artifacts round-trip (parquet
    floats, JSON codebooks) loses nothing."""
    from utility_service_areas_spark.plans.ann_queries import (
        ann_ivfpq_residual_topk,
    )

    emb = _emb(spark)
    d = str(tmp_path / "idx")
    manifest = build_ivfpq_index(emb, d)
    assert manifest["n_vectors"] == emb.count()

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sorted(
        map(
            tuple,
            search_ivfpq_index(spark, d, queries, emb).collect(),
        )
    )
    want = sorted(map(tuple, ann_ivfpq_residual_topk(spark, SMOKE_SF).collect()))
    assert got == want
    assert len(got) == 50  # 5 queries x top-10


def test_uncommitted_index_is_never_readable(spark, tmp_path):
    """Manifest-last commit: a build that crashed after writing
    parquet but before the manifest must raise, not serve a partial
    index."""
    d = str(tmp_path / "idx")
    emb = _emb(spark)
    build_ivfpq_index(emb, d)
    os.remove(os.path.join(d, MANIFEST_NAME))  # simulate pre-commit crash
    with pytest.raises(FileNotFoundError, match="never|missing"):
        load_ivfpq_index(spark, d)
    # and a format bump is loud, not silently misread
    build_ivfpq_index(emb, d)
    with open(os.path.join(d, MANIFEST_NAME)) as f:
        m = json.load(f)
    m["format_version"] = 999
    with open(os.path.join(d, MANIFEST_NAME), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format"):
        load_ivfpq_index(spark, d)


def test_incremental_add_encodes_against_frozen_codebooks(spark, tmp_path):
    """Re-adding vectors the index already contains must reproduce
    their build-time codes EXACTLY: add's assign+residual+encode path
    (persisted centroids, manifest codebooks, _np_assign) is the same
    arithmetic as the build's — the frozen-codebook contract. The
    build subset is ids % 2 == 0 so the codebooks are NOT trained on
    the re-added rows' complement."""
    emb = _emb(spark)
    train = emb.filter(F.col("vec_id") % 2 == 0)
    d = str(tmp_path / "idx")
    build_ivfpq_index(train, d)
    _, _, codes_before = load_ivfpq_index(spark, d)
    before = {r["neighbor_id"]: tuple(r) for r in codes_before.collect()}

    sample_ids = sorted(before)[:50]
    add_to_ivfpq_index(
        spark, d, emb.filter(F.col("vec_id").isin(sample_ids))
    )
    manifest, _, codes_after = load_ivfpq_index(spark, d)
    assert manifest["n_adds"] == 1
    assert manifest["n_vectors"] == len(before) + len(sample_ids)
    dup_rows = codes_after.filter(F.col("neighbor_id").isin(sample_ids)).collect()
    assert len(dup_rows) == 2 * len(sample_ids)
    for r in dup_rows:
        assert tuple(r) == before[r["neighbor_id"]], r["neighbor_id"]


def test_added_vectors_are_searchable(spark, tmp_path):
    """FAISS add() end-to-end: a NEW vector (id outside the corpus,
    equal to query 0's embedding) added after the build must surface
    at rank 1 for query 0 with sim == 1e6 — added codes flow through
    the same cell equi-join as built codes."""
    emb = _emb(spark)
    d = str(tmp_path / "idx")
    build_ivfpq_index(emb, d)

    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    new = spark.createDataFrame(
        [(1_000_000, [float(x) for x in q0])],
        "vec_id long, embedding array<double>",
    )
    add_to_ivfpq_index(spark, d, new)

    queries = emb.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # refine corpus must include the new vector (the index stores
    # codes; refine reads the source of truth)
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(new)
    top = (
        search_ivfpq_index(spark, d, queries, corpus)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert len(top) == 1
    assert top[0]["neighbor_id"] == 1_000_000
    assert top[0]["sim_micros"] == 1_000_000


def test_cli_index_lifecycle(spark, tmp_path, capsys):
    """CLI artifact: build / add / search subcommands drive the
    lifecycle end to end."""
    from utility_service_areas_spark.__main__ import main

    d = str(tmp_path / "idx")
    assert (
        main(
            [
                "index",
                "build",
                "--sf-dir",
                SMOKE_SF,
                "--index-dir",
                d,
                "--where",
                "vec_id % 2 = 0",
            ]
        )
        == 0
    )
    assert os.path.exists(os.path.join(d, MANIFEST_NAME))
    assert (
        main(
            [
                "index",
                "add",
                "--sf-dir",
                SMOKE_SF,
                "--index-dir",
                d,
                "--where",
                "vec_id % 2 = 1",
            ]
        )
        == 0
    )
    with open(os.path.join(d, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert m["n_adds"] == 1
    assert (
        main(["index", "search", "--sf-dir", SMOKE_SF, "--index-dir", d]) == 0
    )
    out = capsys.readouterr().out
    assert "built" in out and "added" in out and "query_id" in out
