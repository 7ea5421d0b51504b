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


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "srcT", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_suffix_lrs_saturation_production_direction(spark, tmp_path):
    """VERDICT r12 task #3 (production-direction twin of the r12
    k_levels=4 pin): when DOCS EXCEED the 2^K resolution — the shape a
    production corpus has when K is picked too small — a repeat longer
    than 2^K saturates at exactly 2^K, while repeats shorter than 2^K
    in the SAME corpus stay exact and equal their higher-K values.
    The K rule: pick K = ceil(log2(max_doc_tokens)); each +1 costs one
    banded dense-rank round + one descent level (measured in
    BENCH_TREND's lrs_k_sweep)."""
    from utility_service_areas_spark.operators.suffix import doc_repeat_stats
    from utility_service_areas_spark.sources.tables import load_table

    shared80 = " ".join(f"s{j}" for j in range(80))  # 80-token repeat
    small = " ".join(f"p{j}" for j in range(10))  # 10-token repeat
    docs = [
        (1, shared80 + " " + " ".join(f"a{j}" for j in range(20))),
        (2, shared80 + " " + " ".join(f"b{j}" for j in range(20))),
        (3, small + " " + " ".join(f"c{j}" for j in range(30))),
        (4, small + " " + " ".join(f"d{j}" for j in range(30))),
    ]
    _write_docs(spark, str(tmp_path), docs)
    loaded = load_table(spark, str(tmp_path), "documents")

    at_k6 = {
        r.doc_id: r.max_rep_len
        for r in doc_repeat_stats(loaded, k_levels=6).collect()
    }
    at_k8 = {
        r.doc_id: r.max_rep_len
        for r in doc_repeat_stats(loaded, k_levels=8).collect()
    }
    # 100-token docs > 2^6: the 80-token repeat saturates at 64 under
    # K=6 and is exact (80) under K=8
    assert at_k6[1] == at_k6[2] == 64
    assert at_k8[1] == at_k8[2] == 80
    # repeats shorter than the resolution are exact at BOTH K
    assert at_k6[3] == at_k6[4] == at_k8[3] == at_k8[4] == 10


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
