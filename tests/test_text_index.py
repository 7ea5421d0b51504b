"""Persisted BM25 text-index lifecycle (operators/text_index.py, S34).

The text twin of the IVFPQ lifecycle: build once -> parquet postings
artifacts -> search many; EXACT incremental add (additive corpus
stats: append == rebuild over the union corpus); first-writer-wins
doc_id idempotence; manifest-last commit (a crashed build is never
readable).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF

from utility_service_areas_spark.operators.text_index import (
    MANIFEST_NAME,
    add_to_bm25_index,
    build_bm25_index,
    load_bm25_index,
    search_bm25_index,
)
from utility_service_areas_spark.sources.tables import load_table


def _docs(spark):
    return load_table(spark, SMOKE_SF, "documents")


def _qterms(spark):
    from utility_service_areas_spark.plans.text_queries import _BM25_QUERIES

    return spark.createDataFrame(
        [(qid, t) for qid, qs in _BM25_QUERIES for t in qs.split()],
        "query_id string, t string",
    )


def test_search_from_artifacts_row_identical_to_inline(spark, tmp_path):
    """The headline pin: build -> persist -> search-from-artifacts
    returns EXACTLY the rows of the inline text_bm25_topk (#219) over
    the same corpus — tf/dl round-trip through parquet losslessly and
    the scoring expressions are replayed operand for operand."""
    from utility_service_areas_spark.plans.text_queries import text_bm25_topk

    docs = _docs(spark)
    d = str(tmp_path / "idx")
    manifest = build_bm25_index(docs, d)
    assert manifest["n_docs"] == docs.count()

    got = sorted(
        map(tuple, search_bm25_index(spark, d, _qterms(spark)).collect())
    )
    want = sorted(map(tuple, text_bm25_topk(spark, SMOKE_SF).collect()))
    assert got == want
    assert len(got) == 30  # 3 queries x top-10


def test_incremental_add_equals_full_rebuild(spark, tmp_path):
    """The EXACTNESS pin that distinguishes the text index from the
    frozen-codebook vector index: build over half the corpus, add the
    other half, and the merged artifacts answer queries IDENTICALLY
    to an index built from scratch over the full corpus — df/N/L are
    additive counts recomputed from the stores at search time."""
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    inc_dir = str(tmp_path / "inc")
    build_bm25_index(half_a, inc_dir)
    manifest = add_to_bm25_index(spark, inc_dir, half_b)
    assert manifest["n_adds"] == 1
    assert manifest["n_docs"] == docs.count()

    full_dir = str(tmp_path / "full")
    full_manifest = build_bm25_index(docs, full_dir)
    assert full_manifest["n_docs"] == manifest["n_docs"]
    assert full_manifest["l_total"] == manifest["l_total"]

    q = _qterms(spark)
    got = sorted(map(tuple, search_bm25_index(spark, inc_dir, q).collect()))
    want = sorted(map(tuple, search_bm25_index(spark, full_dir, q).collect()))
    assert got == want
    assert len(got) == 30


def test_re_add_existing_doc_is_noop(spark, tmp_path):
    """First-writer-wins: re-adding doc_ids already in the index
    changes NOTHING (a retried add batch cannot double-count tf/df),
    and the manifest counts stay exact."""
    docs = _docs(spark)
    d = str(tmp_path / "idx")
    built = build_bm25_index(docs, d)

    some = docs.filter(F.col("doc_id") < 50)
    manifest = add_to_bm25_index(spark, d, some)
    assert manifest["n_docs"] == built["n_docs"]
    assert manifest["l_total"] == built["l_total"]

    _m, postings, doclens = load_bm25_index(spark, d)
    assert doclens.groupBy("doc_id").count().filter("count > 1").count() == 0
    dup_postings = (
        postings.groupBy("t", "doc_id").count().filter("count > 1").count()
    )
    assert dup_postings == 0


def test_uncommitted_index_is_never_readable(spark, tmp_path):
    """Manifest-last commit: a build that crashed before the manifest
    (simulated by deleting it) raises on load — partial parquet is
    invisible, the S31 posture."""
    docs = _docs(spark).limit(20)
    d = str(tmp_path / "idx")
    build_bm25_index(docs, d)
    os.remove(os.path.join(d, MANIFEST_NAME))
    with pytest.raises(FileNotFoundError, match="never|missing"):
        load_bm25_index(spark, d)
    with pytest.raises(FileNotFoundError):
        search_bm25_index(spark, d, _qterms(spark))


def test_format_version_gate(spark, tmp_path):
    docs = _docs(spark).limit(20)
    d = str(tmp_path / "idx")
    build_bm25_index(docs, d)
    mpath = os.path.join(d, MANIFEST_NAME)
    with open(mpath) as f:
        m = json.load(f)
    m["format_version"] = 999
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format"):
        load_bm25_index(spark, d)


def test_search_plan_shape(spark, tmp_path):
    """Scale pins on the from-artifacts plan: the query-term dim and
    the per-term stats join as broadcasts (no shuffle of the pruned
    postings for them), the per-query top-k compiles to the
    WindowGroupLimit pushdown, and the registry-wide anti-patterns
    (cartesian product, Python row UDF) stay absent."""
    docs = _docs(spark)
    d = str(tmp_path / "idx")
    build_bm25_index(docs, d)
    plan = (
        search_bm25_index(spark, d, _qterms(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
