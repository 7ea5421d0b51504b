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
        revenue_bootstrap_ci_fast,
    )

    md5 = revenue_bootstrap_ci(spark, SMOKE_SF).collect()[0]
    fast = revenue_bootstrap_ci_fast(spark, SMOKE_SF).collect()[0]

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
    """The xxhash64 seam has no DuckDB replay; determinism under
    re-execution (fresh plan, fresh shuffle layout) is its stand-in
    partition-independence guarantee."""
    from utility_service_areas_spark.plans.analytics_queries import (
        revenue_bootstrap_ci_fast,
    )

    a = revenue_bootstrap_ci_fast(spark, SMOKE_SF).collect()[0]
    b = (
        revenue_bootstrap_ci_fast(spark, SMOKE_SF)
        .repartition(7)
        .collect()[0]
    )
    assert a == b
