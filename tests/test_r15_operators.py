"""Pins for the round-15 operators: exact-substring splice-out dedup
(#262) and the classifier-driven curation funnel (#263)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF


def _splice(spark, rows, min_rep=8):
    from utility_service_areas_spark.operators.suffix import splice_repeats

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = splice_repeats(docs, min_rep=min_rep)
    return {r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text) for r in out.collect()}


SPAN = "s1 s2 s3 s4 s5 s6 s7 s8"  # the planted 8-token repeat


def test_splice_removes_planted_repeat_all_copies(spark):
    """Lee et al. semantics: the repeated >=8-token span is spliced
    out of EVERY document containing it (all copies go); the unique
    surround survives verbatim; an untouched doc passes through."""
    got = _splice(
        spark,
        [
            (1, f"u1 u2 {SPAN} v1 v2"),
            (2, f"w1 {SPAN} x1"),
            (3, "z1 z2 z3 z4 z5"),
        ],
    )
    assert got[1] == (12, 8, "u1 u2 v1 v2")
    assert got[2] == (10, 8, "w1 x1")
    assert got[3] == (5, 0, "z1 z2 z3 z4 z5")


def test_splice_all_repeat_doc_empties(spark):
    """A document that IS the repeated span comes back empty (not
    dropped from the output, not NULL)."""
    got = _splice(spark, [(1, SPAN), (2, SPAN), (3, "q1 q2 q3")])
    assert got[1] == (8, 8, "")
    assert got[2] == (8, 8, "")
    assert got[3] == (3, 0, "q1 q2 q3")


def test_splice_intra_document_overlap_covered(spark):
    """Self-overlapping repeats count (the corpus-wide suffix view):
    10x the same token is fully covered by its own shifted copy."""
    got = _splice(spark, [(1, " ".join(["r"] * 10)), (2, "a b c")])
    assert got[1] == (10, 10, "")
    assert got[2] == (3, 0, "a b c")


def test_splice_below_threshold_untouched(spark):
    """A 7-token repeat (< min_rep=8) is NOT spliced."""
    seven = "t1 t2 t3 t4 t5 t6 t7"
    got = _splice(spark, [(1, f"a {seven} b"), (2, f"c {seven} d")])
    assert got[1] == (9, 0, f"a {seven} b")
    assert got[2] == (9, 0, f"c {seven} d")


def test_splice_registry_conservation_at_smoke_sf(spark):
    """Over the real substrate: token conservation (kept + removed ==
    original) for every document, and the cleaned corpus re-tokenizes
    to exactly n_tokens - n_removed tokens."""
    import __spark_entry__ as entry

    out = entry.queries()["dedup_suffix_splice"](spark, SMOKE_SF)
    kept = F.when(F.col("cleaned_text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("cleaned_text"), " "))
    )
    bad = out.filter(
        (F.col("n_removed") < 0)
        | (F.col("n_removed") > F.col("n_tokens"))
        | (kept + F.col("n_removed") != F.col("n_tokens"))
    ).count()
    assert bad == 0
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("touched"),
    ).collect()[0]
    assert stats.n == 500  # every input document present
    assert stats.touched > 0  # the substrate does contain >=8-token repeats


def test_splice_agrees_with_lrs_stats(spark):
    """Cross-operator coherence with #220 over the same corpus: a doc
    has n_removed > 0 iff its max_rep_len >= 8 (a covered position
    exists iff some position opens a >=8-token repeat)."""
    import __spark_entry__ as entry

    splice = entry.queries()["dedup_suffix_splice"](spark, SMOKE_SF)
    lrs = entry.queries()["dedup_suffix_lrs"](spark, SMOKE_SF)
    j = splice.join(lrs, "doc_id", "inner")
    mism = j.filter(
        (F.col("n_removed") > 0) != (F.col("max_rep_len") >= 8)
    ).count()
    assert mism == 0


# ---------------------------------------------------------------------------
# #263 classifier-driven funnel
# ---------------------------------------------------------------------------


def _pick_threshold(sweep_rows, target=990_000):
    ok = [
        r.threshold
        for r in sweep_rows
        if r.precision_micros is not None and r.precision_micros >= target
    ]
    return min(ok) if ok else max(r.threshold for r in sweep_rows)


def test_clf_funnel_monotone_and_threshold_from_sweep(spark):
    """The funnel counts are monotone non-increasing across stages,
    and the threshold column equals the operating point the PR sweep
    (#260) implies under the documented pick rule — the train ->
    sweep -> deploy loop is consistent across the two queries."""
    import __spark_entry__ as entry

    q = entry.queries()
    funnel = {
        r.stage_idx: r
        for r in q["curation_funnel_classifier"](spark, SMOKE_SF).collect()
    }
    assert sorted(funnel) == [0, 1, 2, 3, 4]
    for i in range(4):
        assert funnel[i].n_docs >= funnel[i + 1].n_docs
        assert funnel[i].n_tokens >= funnel[i + 1].n_tokens
    assert funnel[1].n_docs > 0  # the deployed gate keeps something

    sweep = q["docs_logreg_pr_sweep"](spark, SMOKE_SF).collect()
    want = _pick_threshold(sweep)
    got = {r.threshold for r in funnel.values()}
    assert got == {want}


def test_clf_funnel_raw_stage_matches_heuristic_funnel(spark):
    """Stage 0 (raw corpus) is gate-independent: identical docs+tokens
    between the classifier funnel and curation_funnel_report."""
    import __spark_entry__ as entry

    q = entry.queries()
    clf = {
        r.stage_idx: (r.n_docs, r.n_tokens)
        for r in q["curation_funnel_classifier"](spark, SMOKE_SF).collect()
    }
    heur = {
        r.stage_idx: (r.n_docs, r.n_tokens)
        for r in q["curation_funnel_report"](spark, SMOKE_SF).collect()
    }
    assert clf[0] == heur[0]


# ---------------------------------------------------------------------------
# #264 Mann-Whitney / #265 CUSUM — cross-implementation replays
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_brute_force_pairs(spark):
    """The banded-cumsum U equals the O(n^2) definition computed in
    plain Python over the same pool: 2U_A = 2#(A>B) + #(A=B); the
    doubled statistics partition 2*n_a*n_b exactly."""
    import __spark_entry__ as entry

    row = entry.queries()["abtest_mann_whitney"](spark, SMOKE_SF).collect()[0]
    pool = (
        spark.read.parquet(SMOKE_SF + "/orders.parquet")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            (F.col("o_orderpriority") == "1-URGENT").alias("ga"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    a_vals = sorted(r.v for r in pool if r.ga)
    b_vals = sorted(r.v for r in pool if not r.ga)
    import bisect

    u2 = 0
    for av in a_vals:  # 2#(A>B) + #(A=B) via two bisects per a-value
        lo = bisect.bisect_left(b_vals, av)
        hi = bisect.bisect_right(b_vals, av)
        u2 += 2 * lo + (hi - lo)
    assert (row.n_a, row.n_b) == (len(a_vals), len(b_vals))
    assert row.u2_a == u2
    assert row.u2_a + row.u2_b == 2 * row.n_a * row.n_b
    assert row.mean2_u == row.n_a * row.n_b
    from collections import Counter

    ties = Counter(r.v for r in pool)
    assert row.tie_cubic == sum(t**3 - t for t in ties.values())


def test_cusum_matches_plain_python_replay(spark):
    """max_abs_cusum_n and the changepoint day replay exactly from
    the per-type daily counts by integer arithmetic alone."""
    import __spark_entry__ as entry
    from collections import defaultdict

    got = {
        r.event_type: (r.n_days, r.total, r.max_abs_cusum_n, r.changepoint_day)
        for r in entry.queries()["events_cusum_changepoint"](
            spark, SMOKE_SF
        ).collect()
    }
    daily = defaultdict(dict)
    rows = (
        spark.read.parquet(SMOKE_SF + "/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .count()
        .collect()
    )
    for r in rows:
        daily[r.event_type][r.d] = r["count"]
    for t, series in daily.items():
        days = sorted(series)
        n, s = len(days), sum(series.values())
        run, best, best_day = 0, -1, None
        for d in days:
            run += n * series[d] - s
            if abs(run) > best:
                best, best_day = abs(run), d
        assert got[t] == (n, s, best, best_day), t


def test_kruskal_wallis_partition_and_python_replay(spark):
    """Σ 2R_g == N(N+1) (pooled ranks partition), and every group's
    doubled rank sum replays from a plain-Python pooled average-rank
    computation."""
    import __spark_entry__ as entry
    from collections import Counter, defaultdict

    rows = entry.queries()["orders_kruskal_wallis"](spark, SMOKE_SF).collect()
    n_total = rows[0].n_total
    assert sum(r.rank2_sum for r in rows) == n_total * (n_total + 1)

    pool = (
        spark.read.parquet(SMOKE_SF + "/orders.parquet")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    t = Counter(r.v for r in pool)
    below, run = {}, 0
    for v in sorted(t):
        below[v] = run
        run += t[v]
    want = defaultdict(int)
    for r in pool:
        want[r.g] += 2 * below[r.v] + t[r.v] + 1  # doubled average rank
    got = {r.o_orderpriority: r.rank2_sum for r in rows}
    assert got == dict(want)
    assert rows[0].tie_cubic == sum(x**3 - x for x in t.values())
