"""Round-10/11 operator pins.

The headline pin here is the bootstrap-CI twin: `revenue_bootstrap_ci`
(md5 hash seam, DuckDB-replayable, driver-oracled) and
`revenue_bootstrap_ci_fast` (xxhash64 seam, ~13x cheaper, no SQL
replay) share one plan builder (`_bootstrap_ci_plan`) and the same
`_POISSON_THRESHOLDS` integer literals by construction — this test is
the correctness anchor the fast variant's registry doc cites in place
of an oracle.
"""

from __future__ import annotations

from tests.conftest import SMOKE_SF

# Two independent 64-replicate bootstraps of the same statistic: the
# rank-2/63 order-statistic bounds carry Monte Carlo error of a
# fraction of the CI width. Measured agreement (sf0.001 and sf0.01):
# every bound within 6% of the md5 CI's width. A broken seam (wrong
# threshold scaling, wrong hash range) shifts bounds by multiple
# widths or breaks the point sum, so 25% is a real pin, not a gimme.
_BOUND_TOL_WIDTHS = 0.25


def test_bootstrap_ci_twin_agreement(spark):
    from utility_service_areas_spark.plans.analytics_queries import (
        _BOOT_REPLICATES,
        revenue_bootstrap_ci,
        revenue_bootstrap_ci_fast_full,
    )

    md5 = revenue_bootstrap_ci(spark, SMOKE_SF).collect()[0]
    fast = revenue_bootstrap_ci_fast_full(spark, SMOKE_SF).collect()[0]

    # The point sum ignores the bootstrap weights entirely — identity
    # here pins that both variants aggregate the same base frame.
    assert md5.point_sum_cents == fast.point_sum_cents
    assert md5.n_replicates == fast.n_replicates == _BOOT_REPLICATES

    width = md5.ci_hi_cents - md5.ci_lo_cents
    assert width > 0
    assert abs(fast.ci_lo_cents - md5.ci_lo_cents) <= _BOUND_TOL_WIDTHS * width
    assert abs(fast.ci_hi_cents - md5.ci_hi_cents) <= _BOUND_TOL_WIDTHS * width

    # Sanity both CIs bracket the point estimate (Poisson(1) bootstrap
    # of a sum is centered on the observed sum).
    for row in (md5, fast):
        assert row.ci_lo_cents <= row.point_sum_cents <= row.ci_hi_cents


def test_bootstrap_ci_fast_is_deterministic(spark):
    """The xxhash64 CI bounds have no DuckDB replay; determinism under
    re-execution (fresh plan, fresh shuffle layout) is their stand-in
    partition-independence guarantee."""
    from utility_service_areas_spark.plans.analytics_queries import (
        revenue_bootstrap_ci_fast_full,
    )

    a = revenue_bootstrap_ci_fast_full(spark, SMOKE_SF).collect()[0]
    b = (
        revenue_bootstrap_ci_fast_full(spark, SMOKE_SF)
        .repartition(7)
        .collect()[0]
    )
    assert a == b


def test_bootstrap_ci_fast_registered_surface_is_the_full_plan(spark):
    """VERDICT r13 task #2: the REGISTERED (driver-attestable) reduced
    surface is a projection of the full xxhash plan — point sum
    identical, ci_ok=1 exactly when the full plan's bounds are
    non-null and ordered, so the CI stage cannot be dead-coded out
    from under the oracle."""
    from utility_service_areas_spark.plans.analytics_queries import (
        _BOOT_REPLICATES,
        revenue_bootstrap_ci_fast,
        revenue_bootstrap_ci_fast_full,
    )

    red = revenue_bootstrap_ci_fast(spark, SMOKE_SF).collect()[0]
    full = revenue_bootstrap_ci_fast_full(spark, SMOKE_SF).collect()[0]
    assert red.point_sum_cents == full.point_sum_cents
    assert red.n_replicates == _BOOT_REPLICATES
    assert red.ci_ok == 1
    assert full.ci_lo_cents is not None
    assert full.ci_lo_cents <= full.ci_hi_cents


# ---------------------------------------------------------------------------
# BPE merge training (r11): validated against a brute-force Python
# reference on adversarial inputs — l==r symbol runs ("aaaa"), pair
# count ties (tiebreak is count DESC, left ASC, right ASC), and words
# collapsing to a single symbol — none of which the fixed substrate
# reliably produces. Pattern per tests/test_r9_properties.py: write a
# tiny documents parquet into tmp_path and call the REGISTERED query.

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_bpe(texts, n_merges, vocab_n):
    import re
    from collections import Counter

    wc = Counter(w for t in texts for w in re.findall("[a-z]+", t.lower()))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_n]
    vocab = [(list(w), f) for w, f in top]
    merges = []
    for rnd in range(n_merges):
        counts = Counter()
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd + 1, l, r, l + r, c))
        nxt = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, f))
        vocab = nxt
    return merges


def _brute_bpe_stats(texts, n_merges, vocab_n):
    """Per-round corpus-cost replay with the same early-stop semantics
    as the Spark fold: stats for round 0, then one row per COMPLETED
    merge round."""
    import re
    from collections import Counter

    wc = Counter(w for t in texts for w in re.findall("[a-z]+", t.lower()))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_n]
    vocab = [(list(w), f) for w, f in top]

    def stat(rnd):
        total = sum(f * len(syms) for syms, f in vocab)
        types = len({s for syms, _ in vocab for s in syms})
        return (rnd, total, types)

    stats = [stat(0)]
    for rnd in range(n_merges):
        counts = Counter()
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), _ = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        nxt = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, f))
        vocab = nxt
        stats.append(stat(rnd + 1))
    return stats


def _run_bpe(spark, tmpdir, texts):
    from utility_service_areas_spark.plans.registry import all_queries
    from utility_service_areas_spark.plans.text_queries import (
        _BPE_MERGES,
        _BPE_VOCAB_N,
    )

    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "documents.parquet")
    )
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
        for r in all_queries()["tokenizer_bpe_merges"](spark, tmpdir)
        .orderBy("merge_round")
        .collect()
    ]
    want = _brute_bpe(texts, _BPE_MERGES, _BPE_VOCAB_N)
    assert got == want

    got_stats = [
        (r.merge_round, r.total_symbols, r.n_symbol_types)
        for r in all_queries()["bpe_compression_sweep"](spark, tmpdir)
        .orderBy("merge_round")
        .collect()
    ]
    want_stats = _brute_bpe_stats(texts, _BPE_MERGES, _BPE_VOCAB_N)
    assert got_stats == want_stats


def test_bpe_fixed_adversarial_cases(spark, tmp_path_factory):
    cases = [
        # l==r runs: greedy non-overlap must pair even offsets only
        ["aaaa aaa aa a", "aaaaa"],
        # classic repeated-bigram word + tie-heavy tiny alphabet
        ["banana bananas ban", "abab baba abba"],
        # every word collapses to one symbol before rounds run out
        ["ab ab ab", "cd cd"],
    ]
    for i, texts in enumerate(cases):
        _run_bpe(spark, str(tmp_path_factory.mktemp(f"bpe{i}")), texts)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_matches_brute_reference(spark, tmp_path_factory, texts):
    _run_bpe(spark, str(tmp_path_factory.mktemp("bpeh")), texts)
