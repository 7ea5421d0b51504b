"""t-digest: a mergeable quantile sketch (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests").

Why this exists: exact `percentile` needs every value of a group in
one place; `approx_percentile` is Spark's built-in sketch. A t-digest
is the industry-standard *mergeable* alternative whose partial states
(≤ ~δ centroids) can be built per partition, shuffled as tiny rows,
and merged associatively — the only shape that survives a 100 TB
group-by-quantile with hot groups.

Distributed plan (two-level merge, no group ever funnels raw rows):
  1. `mapInPandas` over the natural input partitions: build one
     digest per (group, partition-batch) → rows of
     (group, means[], weights[]) — size O(δ), independent of rows.
  2. `groupBy(group).applyInPandas`: merge the ≤ n_partitions digests
     per group (each ≤ δ centroids) and emit quantile estimates.
Shuffle volume is n_partitions × n_groups × O(δ) — constant per
partition-group, never the data.

Pure numpy; deterministic (no RNG, merge order fixed by sorting).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

DELTA = 200  # compression: max centroids per digest


def _k1(q: float, delta: int) -> float:
    """k1 scale function: tails get more resolution than the middle."""
    return delta / (2 * math.pi) * math.asin(2 * q - 1)


def merge_digest(
    means: np.ndarray, weights: np.ndarray, delta: int = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted points/centroids into ≤ delta centroids using the
    k1 scale bound. Deterministic: inputs are sorted by mean first."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = [float(means[0])]
    out_w: list[float] = [float(weights[0])]
    # running left-cumulative weight of completed centroids
    cum = 0.0
    k_lo = _k1(max(min(out_w[0] / total / 2, 1.0), 0.0), delta)
    for m, w in zip(means[1:], weights[1:]):
        q_new = min((cum + out_w[-1] + w) / total, 1.0)
        if _k1(q_new, delta) - k_lo <= 1.0:
            # absorb into the open centroid (weighted mean)
            out_m[-1] += (m - out_m[-1]) * w / (out_w[-1] + w)
            out_w[-1] += w
        else:
            cum += out_w[-1]
            out_m.append(float(m))
            out_w.append(float(w))
            k_lo = _k1(min(max(cum / total, 0.0), 1.0), delta)
    return np.asarray(out_m), np.asarray(out_w)


def digest_quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Estimate quantile q from a digest: centroids sit at the midpoint
    of their cumulative-weight span; linear interpolation between."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # midpoint positions of each centroid
    cum = np.cumsum(weights)
    mids = cum - weights / 2
    if target <= mids[0]:
        return float(means[0])
    if target >= mids[-1]:
        return float(means[-1])
    i = int(np.searchsorted(mids, target)) - 1
    frac = (target - mids[i]) / (mids[i + 1] - mids[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


_PARTIAL_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
    ]
)


def tdigest_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    delta: int = DELTA,
) -> DataFrame:
    """Per-group quantile estimates via distributed t-digest.

    Returns (group, q, estimate) — one row per group × quantile.
    """
    spark = df.sparkSession
    src = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())

    def build_partials(batches):
        for pdf in batches:
            rows = []
            for g, vals in pdf.groupby("group")["value"]:
                v = vals.to_numpy(dtype=np.float64)
                m, w = merge_digest(v, np.ones_like(v), delta)
                rows.append((g, m.tolist(), w.tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=["group", "means", "weights"])

    partials = src.mapInPandas(build_partials, _PARTIAL_SCHEMA)

    out_schema = StructType(
        [
            StructField("group", StringType()),
            StructField("q", DoubleType()),
            StructField("estimate", DoubleType()),
        ]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        m, w = merge_digest(m, w, delta)
        g = pdf["group"].iloc[0]
        return pd.DataFrame(
            [(g, q, digest_quantile(m, w, q)) for q in quantiles],
            columns=["group", "q", "estimate"],
        )

    return partials.groupBy("group").applyInPandas(merge_group, out_schema)


# ---------------------------------------------------- heavy hitters
#
# SpaceSaving (Metwally et al., "Efficient computation of frequent and
# top-k elements in data streams") with the mergeable-summaries
# combination rule (Agarwal et al., PODS 2012): per-partition k-bounded
# counter sets, merged with per-partition eviction floors so the
# upper/lower bounds stay sound. Guarantee: any item with true count
# >= N/k survives, and lb <= true <= ub for every reported item.


class SpaceSaving:
    """k-bounded counter summary. `add(item, by)` amortizes over
    value_counts batches — evictions replace the min counter and
    inherit its value as error."""

    def __init__(self, k: int):
        self.k = k
        self.count: dict[str, int] = {}
        self.error: dict[str, int] = {}

    def add(self, item: str, by: int = 1) -> None:
        if item in self.count:
            self.count[item] += by
        elif len(self.count) < self.k:
            self.count[item] = by
            self.error[item] = 0
        else:
            victim = min(self.count, key=self.count.__getitem__)
            floor = self.count.pop(victim)
            self.error.pop(victim)
            self.count[item] = floor + by
            self.error[item] = floor

    @property
    def floor(self) -> int:
        """Max possible count of any UNtracked item (eviction floor)."""
        return min(self.count.values()) if len(self.count) >= self.k else 0


def heavy_hitter_tokens(
    df: DataFrame, text_col: str, k: int = 64
) -> DataFrame:
    """Approximate heavy-hitter tokens with deterministic bounds.

    Level 1 (mapInPandas): one SpaceSaving(k) summary per partition —
    state is k counters regardless of partition size. Level 2 (plain
    DataFrame algebra, no second UDF): counts sum per token; a token
    absent from a partition's summary could have appeared up to that
    partition's eviction floor times, so
        ub(t) = Σ_present count_p(t) + (Σ_all floor_p − Σ_present floor_p)
        lb(t) = Σ_present (count_p(t) − error_p(t))
    Returns (token, count_lb, count_ub); any token with true frequency
    ≥ N/k is guaranteed present.
    """
    schema = StructType(
        [
            StructField("pid", StringType()),
            StructField("token", StringType()),
            StructField("cnt", DoubleType()),
            StructField("err", DoubleType()),
            StructField("floor", DoubleType()),
        ]
    )

    def partials(batches):
        import uuid

        ss = SpaceSaving(k)
        pid = uuid.uuid4().hex  # partition-local label, never collides
        seen = False
        for pdf in batches:
            seen = True
            toks = pdf[text_col].str.lower().str.split().explode()
            for tok, c in toks.value_counts().items():
                ss.add(tok, int(c))
        if not seen or not ss.count:
            return
        fl = float(ss.floor)
        yield pd.DataFrame(
            [(pid, t, float(c), float(ss.error[t]), fl) for t, c in ss.count.items()],
            columns=["pid", "token", "cnt", "err", "floor"],
        )

    p = df.select(text_col).mapInPandas(partials, schema)
    # Σ floor over all partitions — one tiny distinct-agg, broadcast back.
    floors = p.select("pid", "floor").distinct()
    total_floor = floors.agg(F.sum("floor").alias("__total_floor"))
    per_token = p.groupBy("token").agg(
        F.sum("cnt").alias("__cnt"),
        F.sum(F.col("cnt") - F.col("err")).alias("__lb"),
        F.sum("floor").alias("__present_floor"),
    )
    return (
        per_token.join(F.broadcast(total_floor))
        .select(
            "token",
            F.col("__lb").cast("long").alias("count_lb"),
            (F.col("__cnt") + F.col("__total_floor") - F.col("__present_floor"))
            .cast("long")
            .alias("count_ub"),
        )
    )
