"""Property tests for the trickiest r9 query logic, driven through
the REGISTERED queries over hand-built parquet substrates (tmp_path
stands in for an sf dir) — the oracle gate validates against an
independent SQL formulation on the fixed substrate; these tests
validate against brute-force Python references on adversarial inputs
the substrate may never produce (exact price ties, duplicate
(price, date) rows, leading gaps, single-day groups).
"""

from __future__ import annotations

import datetime
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _write_orders(spark, tmpdir: str, rows) -> str:
    """rows: (o_orderkey, price_double, date) — fill the remaining
    orders columns with constants; returns the sf_dir."""
    df = spark.createDataFrame(
        [
            (k, 1, "O", float(p), datetime.datetime.combine(d, datetime.time()), "1-URGENT")
            for k, p, d in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "orders.parquet")
    )
    return tmpdir


_POINTS = st.lists(
    st.tuples(
        st.integers(0, 400),  # price cents (small range forces ties)
        st.integers(0, 25),  # day offset (forces date ties)
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_POINTS)
def test_pareto_front_matches_brute_dominance(spark, tmp_path_factory, pts):
    """The two-phase skyline must equal the O(n^2) strict-dominance
    reference on inputs with exact price AND date ties (the fixed
    substrate never produces identical prices)."""
    from utility_service_areas_spark.plans.registry import all_queries

    tmpdir = str(tmp_path_factory.mktemp("sky"))
    base = datetime.date(1995, 1, 1)
    rows = [
        (i, cents / 100.0, base + datetime.timedelta(days=off))
        for i, (cents, off) in enumerate(pts)
    ]
    sf = _write_orders(spark, tmpdir, rows)
    got = {
        r.o_orderkey
        for r in all_queries()["orders_pareto_front"](spark, sf).collect()
    }
    want = set()
    for k, p, d in rows:
        pc = round(p * 100)
        dominated = any(
            round(p2 * 100) > pc and d2 > d for k2, p2, d2 in rows if k2 != k
        )
        if not dominated:
            want.add(k)
    assert got == want


def test_gapfill_and_ewma_reference(spark, tmp_path):
    """Gapfill + dyadic EWMA vs a plain-Python integer reference on a
    series with a leading value, a 3-day gap, and a single-day
    second group."""
    from utility_service_areas_spark.plans.registry import all_queries

    base = datetime.date(2000, 1, 1)
    rows = [
        (1, 100.00, base),
        (2, 50.00, base),  # same day: sums to 15000 cents
        (3, 20.00, base + datetime.timedelta(days=4)),  # 3-day gap
    ]
    sf = _write_orders(spark, str(tmp_path), rows)

    gap = {
        (r.d, ): (r.is_gap, r.filled_rev_cents)
        for r in all_queries()["orders_daily_gapfill"](spark, sf).collect()
    }
    days = sorted(d for (d,) in gap)
    assert len(days) == 5  # dense calendar over the span
    # day 0: both orders summed; days 1-3: gaps carrying 15000 forward
    assert gap[(days[0],)] == (0, 15000)
    for d in days[1:4]:
        assert gap[(d,)] == (1, 15000)
    assert gap[(days[4],)] == (0, 2000)

    ewma = {
        r.d: r.ewma_x65536_cents
        for r in all_queries()["orders_daily_ewma"](spark, sf).collect()
    }
    # python reference: zero-padded 16-tap dyadic kernel over the
    # filled series [15000, 15000, 15000, 15000, 2000]
    filled = [15000, 15000, 15000, 15000, 2000]
    for i, d in enumerate(days):
        want = sum(
            filled[i - lag] * (1 << (15 - lag))
            for lag in range(16)
            if i - lag >= 0
        )
        assert ewma[d] == want


def test_burst_detection_quiet_gap_reference(spark, tmp_path):
    """r9 code-review regression pin: after a multi-day quiet gap the
    trailing baseline must be the (zero-filled) last 24 CALENDAR
    hours, so a resumption spike IS flagged — the sparse-rollup ROWS
    frame silently used counts from days earlier and missed it."""
    from utility_service_areas_spark.plans.registry import all_queries

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # 30 busy hours (20 events each), then 72 quiet hours, then one
    # modest hour (5 events) — a burst vs the quiet day, NOT vs the
    # stale busy day.
    for h in range(30):
        for _ in range(20):
            rows.append((eid, base + datetime.timedelta(hours=h)))
            eid += 1
    spike_ts = base + datetime.timedelta(hours=30 + 72)
    for _ in range(5):
        rows.append((eid, spike_ts))
        eid += 1
    df = spark.createDataFrame(
        [(k, ts, 1, "click", 1.0, "{}") for k, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    out = {
        r.h: (r.cnt, r.trail_cnt, r.n_trail, r.burst)
        for r in all_queries()["events_burst_detection"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 30 + 72 + 1  # dense calendar
    cnt, trail, n_trail, burst = out[spike_ts]
    assert (cnt, trail, n_trail) == (5, 0, 24)  # trailing day was silent
    assert burst == 1  # 5 * 24 * 10 > 15 * 0


def _write_lineitem(spark, tmpdir: str, rows) -> str:
    """rows: (l_orderkey, l_partkey, extendedprice, discount)."""
    df = spark.createDataFrame(
        [
            (
                int(ok),
                int(pk),
                1,
                1,
                1.0,
                float(px),
                float(disc),
                0.0,
                "N",
                "O",
                datetime.datetime(1995, 1, 1),
            )
            for ok, pk, px, disc in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "lineitem.parquet")
    )
    return tmpdir


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 30)),  # (part, price) — few
        min_size=1,  # distinct values force heavy revenue ties
        max_size=40,
    )
)
def test_abc_prefix_sum_matches_brute_cumsum(spark, tmp_path_factory, items):
    """The digit-band distributed prefix sum must equal the brute
    global running sum under HEAVY revenue ties (many parts with
    identical cents — the substrate's uniform prices rarely tie)."""
    from utility_service_areas_spark.plans.registry import all_queries

    tmpdir = str(tmp_path_factory.mktemp("abc"))
    rows = [(i, part, price, 0.0) for i, (part, price) in enumerate(items)]
    sf = _write_lineitem(spark, tmpdir, rows)
    got = {
        r.p_partkey: (r.rev_cents, r.cum_cents, r.abc_class)
        for r in all_queries()["part_abc_classification"](spark, sf).collect()
    }
    # brute reference
    rev: dict[int, int] = {}
    for _, part, price, _ in rows:
        rev[part] = rev.get(part, 0) + round(price * 100)
    total = sum(rev.values())
    cum = 0
    want = {}
    for part, cents in sorted(rev.items(), key=lambda t: (-t[1], t[0])):
        cum += cents
        cls = "A" if cum * 100 <= total * 80 else ("B" if cum * 100 <= total * 95 else "C")
        want[part] = (cents, cum, cls)
    assert got == want
