"""Persisted BM25 text-index lifecycle: build once -> search many (S34).

The text twin of operators/vector_index.py (r13): every retrieval
registry query tokenizes + counts the corpus inline (right for a
value-oracled benchmark, wrong for serving) — a 100 TB search path
builds the inverted index ONCE, persists it, and answers many query
workloads from the artifacts (the Lucene segment contract re-expressed
as parquet + a manifest).

Index layout under ``index_dir``::

    postings/       parquet (t, doc_id, tf)   — the inverted index
    doclens/        parquet (doc_id, dl)      — per-doc token counts
    _MANIFEST.json  params + counts           — commit marker, LAST

Commit protocol: parquet artifacts first, manifest LAST (the S31/
vector_index posture) — a crashed build never surfaces a readable
index; ``load_bm25_index`` raises without the manifest.

EXACT incremental add — and why it's exact where IVFPQ's is "frozen-
codebook approximate": BM25's corpus statistics (df, N, total length)
are all ADDITIVE COUNTS derived from the postings/doclens stores at
search time, so appending a new batch's postings + doclens yields the
same index state as rebuilding from scratch over the union corpus
(pinned in tests/test_text_index.py). Re-adding an existing doc_id is
a NO-OP (first-writer-wins anti-join against doclens), so a retried
add batch cannot double-count a document's term frequencies.

``search_bm25_index`` replays ``bm25_topk_frame``'s scoring
(plans/text_queries.py, #219) operand for operand — reading tf from
postings/ and dl from doclens/ instead of tokenizing — so
search-from-artifacts is row-identical to the inline query over the
same corpus (driver-oracled via text_bm25_search_persisted against
the same SQL as #219).

Scale shape: postings/ is the only corpus-sized artifact and both
search and add stream it; the broadcast query-term dim prunes the
postings FIRST via a broadcast hash join — one streaming pass, no
shuffle of the postings, and at production scale the postings table
would be written bucketed-by-term so the prune is a bucket lookup
(the inverted-index access pattern survives persistence); df/stats are
tiny aggregates of the pruned postings / doclens; per-query top-k is
the WindowGroupLimit pushdown. Nothing corpus-sized reaches the
driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"
_FORMAT_VERSION = 1


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def _tokenize_counts(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a document frame — the tf/dl stages of
    bm25_topk_frame verbatim. The corpus is tokenized exactly ONCE:
    postings are materialized (localCheckpoint), and doclens derive
    from them (dl = sum tf per doc, an identity of the tokenization) —
    r13 code review #7 found the naive two-frame version paying three
    corpus-sized tokenize passes per build."""
    from utility_service_areas_spark.functions.textops import tokens
    from utility_service_areas_spark.operators.dedup import lineage_cut

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    postings = lineage_cut(
        tok.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    )
    doclens = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return postings, doclens


def build_bm25_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Tokenize + persist the inverted index; returns the manifest."""
    postings, doclens = _tokenize_counts(docs, id_col, text_col)
    os.makedirs(index_dir, exist_ok=True)
    postings.write.mode("overwrite").parquet(os.path.join(index_dir, "postings"))
    doclens.write.mode("overwrite").parquet(os.path.join(index_dir, "doclens"))
    n_docs, l_total = (
        doclens.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0] or (0, 0)
    )
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "bm25_postings",
        "id_col": id_col,
        "text_col": text_col,
        "n_docs": int(n_docs or 0),
        "l_total": int(l_total or 0),
        "n_adds": 0,
    }
    with open(_manifest_path(index_dir), "w") as f:  # commit marker, LAST
        json.dump(manifest, f)
    return manifest


def load_bm25_index(
    spark: SparkSession, index_dir: str
) -> tuple[dict, DataFrame, DataFrame]:
    """(manifest, postings frame, doclens frame). Raises
    FileNotFoundError if the index was never committed (no manifest —
    a crashed build's partial parquet is invisible by contract)."""
    mpath = _manifest_path(index_dir)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no committed index at {index_dir} ({MANIFEST_NAME} missing — "
            "a partial/crashed build is not readable)"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"index format {manifest.get('format_version')} != "
            f"{_FORMAT_VERSION}"
        )
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    return manifest, postings, doclens


def add_to_bm25_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    id_col: str | None = None,
    text_col: str | None = None,
) -> dict:
    """EXACT incremental add: tokenize only the new batch, append its
    postings + doclens. Because every BM25 corpus statistic (df, N,
    L) is an additive count recomputed from the stores at search
    time, the post-add index is IDENTICAL to a from-scratch rebuild
    over the union corpus — no frozen-state approximation. A doc_id
    already in the index is skipped (first-writer-wins), so a retried
    batch cannot double-count. Returns the updated manifest."""
    manifest, _postings, doclens = load_bm25_index(spark, index_dir)
    idc = id_col or manifest["id_col"]
    txc = text_col or manifest["text_col"]
    fresh = new_docs.join(
        doclens.select(F.col("doc_id").alias(idc)), idc, "left_anti"
    )
    # Intra-batch duplicate doc_ids would also double-count (the
    # anti-join only shields against the COMMITTED store — r13 code
    # review #4): keep one row per id, deterministically (min text
    # hash), so a retried-or-unioned upstream can't inflate tf/dl.
    fresh = fresh.groupBy(idc).agg(
        F.min_by(F.col(txc), F.md5(F.col(txc))).alias(txc)
    )
    new_postings, new_doclens = _tokenize_counts(fresh, idc, txc)
    new_postings.write.mode("append").parquet(os.path.join(index_dir, "postings"))
    new_doclens.write.mode("append").parquet(os.path.join(index_dir, "doclens"))
    # Count the COMMITTED store, not the batch: a crashed add that
    # appended parquet but never reached the manifest is absorbed into
    # the next add's recount (self-healing, the vector_index posture).
    n_docs, l_total = (
        spark.read.parquet(os.path.join(index_dir, "doclens"))
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .collect()[0]
    )
    manifest["n_docs"] = int(n_docs or 0)
    manifest["l_total"] = int(l_total or 0)
    manifest["n_adds"] += 1
    with open(_manifest_path(index_dir), "w") as f:
        json.dump(manifest, f)
    return manifest


def search_bm25_index(
    spark: SparkSession,
    index_dir: str,
    qterms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Answer a query workload (query_id, t) from the persisted
    artifacts — bm25_topk_frame's scoring expressions operand for
    operand (same k1=1.2/b=0.75 rational clearing, same integer-log2
    idf, same millibit rounding BEFORE the per-doc sum), with tf/dl
    read from parquet instead of tokenized. Row-identical to the
    inline #219 over the same corpus."""
    from pyspark.sql.window import Window

    _manifest, postings, doclens = load_bm25_index(spark, index_dir)
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("l_total")
    )
    pruned = postings.join(F.broadcast(qterms.select("t").distinct()), "t")
    dfreq = pruned.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))

    idf_bits = F.log2(2 * F.col("n_docs") + 2) - F.log2(2 * F.col("df") + 1)
    norm = (22 * F.col("l_total") * F.col("tf")).cast("double") / (
        10 * F.col("l_total") * F.col("tf")
        + 3 * F.col("l_total")
        + 9 * F.col("dl") * F.col("n_docs")
    ).cast("double")
    term_millibits = F.round(idf_bits * norm * 1000).cast("long")

    scores = (
        pruned.join(F.broadcast(qterms), "t")
        .join(F.broadcast(dfreq), "t")
        .join(doclens, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(term_millibits).alias("score_millibits"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_millibits").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("rk").cast("long").alias("rk"),
            "doc_id",
            "score_millibits",
            "n_terms_matched",
        )
    )
