"""Round-13 property / regression pins.

House rule (memory: r9 skyline lesson): for every operator with an
order/tie/boundary rule, add a tie-ADVERSARIAL property test feeding
values the substrate never produces — the mirrored oracle checks
cross-engine arithmetic, not semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _brute_cdc_winner(rows):
    """Reference winner under (v DESC, op ASC, bal ASC NULLS FIRST)."""

    def key(r):
        v, op, bal = r
        return (-v, op, (0, 0) if bal is None else (1, bal))

    return min(rows, key=key)


CDC_TIE_LOGS = [
    # (rows per key, description) — every row is (v, op, bal_cents)
    [(2, "U", 100), (2, "D", None)],  # same-version delete+update: D wins
    [(2, "D", None), (2, "U", 100)],  # arrival order must not matter
    [(3, "U", 500), (3, "U", 200)],  # same-version updates: lower bal wins
    [(1, "U", 9), (2, "U", 7), (2, "U", None)],  # NULL bal sorts first
    [(5, "D", None), (5, "D", None), (4, "U", 1)],  # exact duplicates
]


def test_cdc_version_tie_batch_window_is_deterministic(spark):
    """ADVICE r12: cdc_latest_version_merge's window ordered by v DESC
    alone — nondeterministic on duplicate versions. Now the shared
    cdc_tiebreak_order resolves ties (delete beats update, then
    bal ASC NULLS FIRST); pin the window pick against a brute
    reference on tie-adversarial changelogs the substrate never
    produces (its versions are unique per key by construction)."""
    from utility_service_areas_spark.plans.etl_queries import (
        cdc_tiebreak_order,
    )

    rows = []
    for k, log in enumerate(CDC_TIE_LOGS):
        rows.extend((k, v, op, bal) for v, op, bal in log)
    df = spark.createDataFrame(
        rows, "k long, v long, op string, bal_cents long"
    )
    w = Window.partitionBy("k").orderBy(*cdc_tiebreak_order())
    got = {
        r.k: (r.v, r.op, r.bal_cents)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    want = {k: _brute_cdc_winner(log) for k, log in enumerate(CDC_TIE_LOGS)}
    assert got == want


def test_cdc_version_tie_stream_fold_matches_batch(spark):
    """The S32 fold must resolve version ties exactly like the batch
    window — including when the tied rows arrive in SEPARATE calls
    (cross-micro-batch state). r12's fold kept first-arrival on ties."""
    from utility_service_areas_spark.streaming.events import (
        _cdc_state_fn,
        _cdc_winner_key,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    for log in CDC_TIE_LOGS:
        for split in range(1, len(log)):
            state = FakeState()
            out = None
            for batch in (log[:split], log[split:]):
                pdf = pd.DataFrame(
                    {
                        "v": [r[0] for r in batch],
                        "op": [r[1] for r in batch],
                        "bal_cents": pd.array(
                            [r[2] for r in batch], dtype="Int64"
                        ),
                    }
                )
                out = next(_cdc_state_fn((7,), iter([pdf]), state))
            bal = out["bal_cents"][0]
            got = (
                int(out["v"][0]),
                str(out["op"][0]),
                None if pd.isna(bal) else int(bal),
            )
            assert got == _brute_cdc_winner(log), (log, split)
            # and the comparator is the SAME total order the window uses
            assert _cdc_winner_key(got) == min(
                _cdc_winner_key(r) for r in log
            )
