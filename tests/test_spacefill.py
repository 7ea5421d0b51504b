"""Hilbert-curve kernel pins (S45, r16 — VERDICT r15 task #5).

The exhaustive tests are a COMPLETE correctness proof of the curve at
pin size: a Hilbert index over a 2^(bits·dims) grid must be a
permutation whose consecutive cells are grid neighbors at Manhattan
distance exactly 1 (the defining unit-step property — Morton fails it
at every diagonal jump, which is precisely why it prunes worse)."""

from __future__ import annotations

import numpy as np
import pytest

from utility_service_areas_spark.functions.spacefill import (
    hilbert_index,
    hilbert_index_scalar,
)


@pytest.mark.parametrize("bits,dims", [(4, 2), (2, 3), (1, 4), (6, 1)])
def test_hilbert_is_unit_step_permutation_exhaustive(bits, dims):
    side = 1 << bits
    grid = np.stack(
        np.meshgrid(*([np.arange(side)] * dims), indexing="ij"), axis=-1
    ).reshape(-1, dims)
    idx = hilbert_index(grid, bits)
    assert sorted(idx.tolist()) == list(range(side**dims))  # permutation
    walk = grid[np.argsort(idx)]
    steps = np.abs(np.diff(walk.astype(np.int64), axis=0)).sum(axis=1)
    assert (steps == 1).all(), f"non-unit steps at {np.unique(steps)}"


def test_hilbert_vectorized_matches_scalar_reference():
    rng = np.random.default_rng(42)
    pts = rng.integers(0, 1 << 7, size=(500, 3), dtype=np.int64)
    vec = hilbert_index(pts, 7)
    ref = np.array(
        [hilbert_index_scalar(list(p), 7) for p in pts], dtype=np.uint64
    )
    assert (vec == ref).all()


def test_morton_has_diagonal_jumps_hilbert_avoids():
    """The documented reason Hilbert exists: Morton's walk takes
    non-unit steps (diagonal jumps) on the same grid where Hilbert's
    never does."""
    bits, side = 3, 8
    grid = np.array(
        [(x, y) for x in range(side) for y in range(side)], dtype=np.int64
    )
    morton = np.zeros(len(grid), dtype=np.int64)
    for b in range(bits):
        for i in range(2):
            morton |= ((grid[:, i] >> b) & 1) << (2 * b + i)
    walk = grid[np.argsort(morton)]
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps > 1).any()  # Morton jumps


def test_hilbert_rejects_bad_shapes():
    with pytest.raises(ValueError, match="rows, dims"):
        hilbert_index(np.arange(8), 3)
    with pytest.raises(ValueError, match="overflows"):
        hilbert_index(np.zeros((1, 8), dtype=np.int64), 8)
