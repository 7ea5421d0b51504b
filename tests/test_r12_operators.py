"""Round-12 operator pins: BM25 plan shape + scoring semantics,
suffix-array substring dedup, k-NN graph recall. Pattern per
tests/test_r9_properties.py: hand-built parquet substrates into
tmp_path, call the REGISTERED query with sf_dir=tmp, compare against a
brute-force Python reference — the mirrored SQL oracle pins
cross-engine arithmetic, these pin SEMANTICS."""

from __future__ import annotations

import math

import pyspark.sql.functions as F  # noqa: F401 (used by some pins)

from tests.conftest import SMOKE_SF


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _write_docs(spark, path, rows):
    """rows: list of (doc_id, text). Writes the documents schema the
    loaders expect (lang/source/n_chars present but incidental)."""
    spark.createDataFrame(
        [(i, t, "en", "srcT", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_bm25_plan_has_topk_pushdown_and_no_python(spark):
    from utility_service_areas_spark.plans.registry import all_queries

    df = all_queries()["text_bm25_topk"](spark, SMOKE_SF)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan, "per-query top-k must push down"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_scores_match_float_reference(spark, tmp_path):
    """The registered millibit-integer BM25 must rank identically to —
    and sit within 1 millibit of — a plain float BM25 (Robertson
    idf = ln((N-df+0.5)/(df+0.5)+1) in log2 form, k1=1.2, b=0.75)
    computed by an independent Python loop over the same toy corpus."""
    from utility_service_areas_spark.plans.registry import all_queries
    from utility_service_areas_spark.plans.text_queries import _BM25_QUERIES

    corpus = [
        (1, "hash join merge hash hash"),
        (2, "join merge"),
        (3, "scan filter sort scan the a"),
        (4, "stream window batch stream stream window"),
        (5, "hash the the the the the the the the the"),
        (6, "sort"),
    ]
    _write_docs(spark, str(tmp_path), corpus)

    got = {
        (r.query_id, r.doc_id): (r.rk, r.score_millibits, r.n_terms_matched)
        for r in all_queries()["text_bm25_topk"](spark, str(tmp_path)).collect()
    }

    toks = {d: t.split() for d, t in corpus}
    n_docs = len(corpus)
    l_total = sum(len(v) for v in toks.values())
    ref = {}
    for qid, qs in _BM25_QUERIES:
        scores = {}
        for term in qs.split():
            df_t = sum(1 for v in toks.values() if term in v)
            if df_t == 0:
                continue
            idf = math.log2(2 * n_docs + 2) - math.log2(2 * df_t + 1)
            for d, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                norm = (22 * l_total * tf) / (
                    10 * l_total * tf + 3 * l_total + 9 * len(v) * n_docs
                )
                milli, nm = scores.get(d, (0, 0))
                scores[d] = (milli + round(idf * norm * 1000), nm + 1)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for rk, (d, (milli, nm)) in enumerate(ranked[:10], start=1):
            ref[(qid, d)] = (rk, milli, nm)

    assert set(got) == set(ref)
    for key, (rk, milli, nm) in ref.items():
        grk, gmilli, gnm = got[key]
        assert (grk, gnm) == (rk, nm), f"rank/match drift at {key}"
        assert abs(gmilli - milli) <= 1, f"score drift at {key}"
