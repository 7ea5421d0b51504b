"""Semantics tests for the round-6 LLM-pipeline additions:
repetition signals, domain quota sampling, exact-substring dedup,
per-user z-score anomalies, RFM segmentation. The DuckDB oracle
covers value equality; these pin the semantic properties the oracle
hash alone can't explain (quota exactness under salting, span
sharing symmetry, quartile balance).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SMOKE_SF


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_repetition_signals_hand_checked(spark):
    out = {
        r.doc_id: r for r in _q("docs_repetition_signals")(spark, SMOKE_SF).collect()
    }
    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(SMOKE_SF + "/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    # independent recompute in plain python for 25 docs
    for doc_id in sorted(docs)[:25]:
        toks = docs[doc_id]
        n = len(toks)
        uni: dict[str, int] = {}
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        bi: dict[str, int] = {}
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
        r = out[doc_id]
        assert r.n_tok == n
        assert r.top_tok_micros == round(1e6 * max(uni.values()) / n)
        assert r.dup_tok_micros == round(
            1e6 * sum(c for c in uni.values() if c >= 2) / n
        )
        want_bi = round(1e6 * max(bi.values()) / (n - 1)) if n >= 2 else 0
        assert r.top_bigram_micros == want_bi


def test_domain_quota_salted_topk_is_exact(spark):
    """The two-phase (salt-bucket then per-source) top-K must equal the
    single-window reference exactly — the salting is a plan change,
    never a semantics change."""
    got = _q("domain_quota_sample")(spark, SMOKE_SF).collect()
    docs = spark.read.parquet(SMOKE_SF + "/documents.parquet").select(
        "doc_id", "source"
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ref = (
        docs.withColumn("samp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("samp_rank") <= 40)
        .collect()
    )
    assert {(r.doc_id, r.source, r.samp_rank) for r in got} == {
        (r.doc_id, r.source, r.samp_rank) for r in ref
    }
    # quota actually binds: no source exceeds K, hot sources hit it
    per_source: dict[str, int] = {}
    for r in got:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert max(per_source.values()) <= 40


def test_exact_substring_planted_duplicate(spark):
    """Two synthetic docs sharing one 8-token span (and nothing else
    8 tokens long in common) must each report exactly one shared span."""
    from utility_service_areas_spark.plans.pipeline_queries import (
        dedup_exact_substring,
    )
    import os
    import tempfile

    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"one two three {span} four five six"),
        (2, f"seven eight nine ten {span} eleven"),
        (3, "totally unrelated words that never repeat anything at all here"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r.doc_id: r for r in dedup_exact_substring(spark, td).collect()}
    assert out[1].n_shared_spans == 1
    assert out[2].n_shared_spans == 1
    assert out[3].n_shared_spans == 0
    # doc 3 has 10 tokens -> 3 distinct spans
    assert out[3].n_spans == 3


def test_zscore_flags_only_true_outliers(spark):
    import math

    got = _q("event_anomaly_zscore")(spark, SMOKE_SF).collect()
    ev = spark.read.parquet(SMOKE_SF + "/events.parquet").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    want = set()
    for uid, rows in by_user.items():
        vals = [r.value for r in rows]
        mean = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
        if sd <= 0:
            continue
        for r in rows:
            if abs(round(1e6 * (r.value - mean) / sd)) > 2_000_000:
                want.add(r.event_id)
    assert {r.event_id for r in got} == want


def test_rfm_quartiles_are_balanced_and_coded(spark):
    got = _q("customer_rfm_segments")(spark, SMOKE_SF).collect()
    n = len(got)
    assert n > 0
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        vals = [getattr(r, col) for r in got]
        assert set(vals) <= {1, 2, 3, 4}
        # exact percentiles: each quartile holds 15-35% of customers
        # (ties on small-int metrics skew buckets, but never collapse them)
        for q in (1, 4):
            share = vals.count(q) / n
            assert 0.10 <= share <= 0.45, (col, q, share)
    for r in got:
        assert r.rfm_code == r.r_quartile * 100 + r.f_quartile * 10 + r.m_quartile


def test_keep_best_picks_most_complete_member(spark):
    rows = _q("dedup_keep_best")(spark, SMOKE_SF).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(SMOKE_SF + "/documents.parquet").collect()
    }
    assert {r.doc_id for r in rows} == set(docs)
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        best = [r for r in members if r.kept == 1]
        assert len(best) == 1  # exactly one survivor per cluster
        b = best[0]
        assert all(r.best_id == b.doc_id for r in members)
        # the survivor is the longest member, min doc_id on ties
        want = min(members, key=lambda r: (-docs[r.doc_id], r.doc_id))
        assert b.doc_id == want.doc_id


def test_r6_queries_on_empty_substrate(spark, tmp_path):
    """Cluster-scale routine: empty filter results / empty partitions.
    Every r6 plan query must return an empty, correctly-typed frame on
    an empty substrate — not raise (null percentile bounds, null
    max(vec_id), empty recursive closure are all on this path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schemas = {
        "documents": pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        "events": pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        "orders": pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        "embeddings": pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    }
    for name, schema in schemas.items():
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema], schema=schema
            ),
            str(tmp_path / f"{name}.parquet"),
        )
    for key in (
        "docs_repetition_signals",
        "domain_quota_sample",
        "dedup_exact_substring",
        "event_anomaly_zscore",
        "customer_rfm_segments",
        "embedding_pair_histogram",
        "dedup_keep_best",
    ):
        assert _q(key)(spark, str(tmp_path)).count() == 0, key


def test_explicit_hll_accuracy_vs_exact(spark):
    """The explicit HLL (value-oracled) must land within 10% of exact
    distinct counts on the smoke substrate (measured ~1.5%); the
    register count can never exceed m=1024."""
    got = {
        r.event_type: r
        for r in _q("hll_registers_users")(spark, SMOKE_SF).collect()
    }
    ev = spark.read.parquet(SMOKE_SF + "/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k].n_registers_used <= 1024
        assert abs(got[k].hll_estimate - n) / n <= 0.10, (k, got[k], n)


def test_exact_substring_prune_path_is_exact(spark):
    """The counting-bloom singleton prune (r8) must be bit-identical
    to the unpruned path — dropped spans are provably globally unique,
    so no repeated-span count can change."""
    from utility_service_areas_spark.plans.pipeline_queries import (
        dedup_exact_substring,
    )

    base = dedup_exact_substring(spark, SMOKE_SF).collect()
    pruned = dedup_exact_substring(
        spark, SMOKE_SF, prune_singletons=True
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, pruned))


def test_repeated_key_prefilter_keeps_all_repeats(spark):
    """Prefilter contract: every row of a key that occurs >= 2 times
    survives; survivors may include some singletons (FPs), never fewer
    rows per repeated key."""
    from collections import Counter

    from utility_service_areas_spark.operators.bloom import (
        repeated_key_prefilter,
    )

    rows = [(i, f"k{i % 300}") for i in range(600)] + [
        (1000 + i, f"solo{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["rid", "key"])
    out = repeated_key_prefilter(df, "key", m=1 << 14, k=2).collect()
    got = Counter(r.key for r in out)
    for j in range(300):
        assert got[f"k{j}"] == 2, f"lost occurrences of repeated key k{j}"
    # the prune actually prunes: most of the 500 singletons are gone
    n_solo = sum(1 for kk in got if kk.startswith("solo"))
    assert n_solo < 250


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC property itself: doc B = doc A with one token inserted
    up front. Content-defined boundaries re-align after the insertion,
    so most of A's chunks reappear verbatim in B — which non-
    overlapping FIXED chunking (position mod 16) structurally loses."""
    import pandas as pd
    from pyspark.sql import functions as F

    from utility_service_areas_spark.plans.pipeline_queries import _CDC_MOD

    base = " ".join(f"tok{i}" for i in range(400))
    shifted = "INSERTED " + base
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [base, shifted]})
    )

    toks = F.split(F.trim(F.col("text")), r"[ \t\n\x0b\f\r]+")
    pos = docs.select("doc_id", F.posexplode(toks).alias("i0", "tok")).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "tok"
    )
    flag = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % _CDC_MOD
        == 0
    ).cast("int")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cid = pos.withColumn("f", flag).withColumn(
        "chunk_id", F.coalesce(F.sum("f").over(w), F.lit(0))
    )
    chunk_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "tok"))), lambda x: x["tok"]
        ),
        " ",
    )
    hashes = {
        d: {
            r.h
            for r in cid.filter(F.col("doc_id") == d)
            .groupBy("chunk_id")
            .agg(F.md5(chunk_text).alias("h"))
            .collect()
        }
        for d in (1, 2)
    }
    cdc_shared = len(hashes[1] & hashes[2]) / len(hashes[1])
    assert cdc_shared >= 0.8, cdc_shared  # only the first chunk differs

    # fixed non-overlapping 16-token chunking on the same pair: the
    # 1-token shift de-aligns every chunk
    def fixed_chunks(text):
        t = text.split()
        return {" ".join(t[i : i + 16]) for i in range(0, len(t), 16)}

    fixed_shared = len(fixed_chunks(base) & fixed_chunks(shifted)) / len(
        fixed_chunks(base)
    )
    assert fixed_shared <= 0.1, fixed_shared


def test_cdc_cluster_guards(spark, tmp_path):
    """dedup_cdc_clusters' two eligibility guards, pinned end-to-end:
    a chunk is a cluster edge only if it has >= 2 tokens (single-token
    chunks are stopword boilerplate) AND is shared by <= 16 docs
    (hotter chunks are template boilerplate). Identical docs that
    share only guarded chunks stay singletons."""
    import pandas as pd

    from utility_service_areas_spark.plans.pipeline_queries import (
        dedup_cdc_clusters,
    )

    long_text = " ".join(f"word{i}" for i in range(64))
    rows = [
        # a genuine near-dup pair: every multi-token chunk shared
        {"doc_id": 1, "text": long_text},
        {"doc_id": 2, "text": long_text},
        # 21 identical docs: every shared chunk is hotter than the
        # 16-doc cap, so NO edges despite being exact duplicates
        *[{"doc_id": 100 + i, "text": "alpha beta gamma delta"} for i in range(21)],
        # an identical pair whose only chunk is a single token:
        # ineligible by the min-token guard
        {"doc_id": 300, "text": "merge"},
        {"doc_id": 301, "text": "merge"},
    ]
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.doc_id: (r.keeper_id, r.cluster_size)
        for r in dedup_cdc_clusters(spark, str(tmp_path)).collect()
    }
    assert len(out) == 25
    assert out[1] == (1, 2) and out[2] == (1, 2)  # pair clustered
    for i in range(21):  # hot cap: 21 exact dups stay singletons
        assert out[100 + i] == (100 + i, 1)
    assert out[300] == (300, 1) and out[301] == (301, 1)  # min-token
