"""Oracle tests for sorted-segment reductions (ops/segments.py)."""

import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import segments


def _np_segment_sum(vals, seg, num_segments):
    out = np.zeros((num_segments,) + vals.shape[1:], np.float64)
    for i, s in enumerate(seg):
        if s < num_segments:
            out[s] += vals[i]
    return out


def test_sorted_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    n, s = 4096, 600
    seg = np.sort(rng.integers(0, s + 1, n)).astype(np.int32)  # incl. dropped
    vals = rng.normal(size=(n, 5)).astype(np.float32)
    got = np.asarray(segments.sorted_segment_sum(
        jnp.asarray(vals), jnp.asarray(seg), s))
    want = _np_segment_sum(vals, seg, s)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_compensation_survives_large_offsets():
    """Metric coordinates far from the origin: a plain f32 prefix loses the
    per-segment sums entirely; the compensated scan keeps them to ~1e-3."""
    rng = np.random.default_rng(1)
    n, s = 262144, 49152
    seg = np.sort(rng.integers(0, s, n)).astype(np.int32)
    vals = (1000.0 + rng.normal(size=(n, 1))).astype(np.float32)
    got = np.asarray(segments.sorted_segment_sum(
        jnp.asarray(vals), jnp.asarray(seg), s))[:, 0]
    want = _np_segment_sum(vals, seg, s)[:, 0]
    assert np.max(np.abs(got - want)) < 2e-3
    # demonstrate the naive prefix would NOT survive (ULP(2.6e8) = 16)
    naive = np.cumsum(vals[:, 0], dtype=np.float32)
    lo = np.searchsorted(seg, np.arange(s), side="left")
    hi = np.searchsorted(seg, np.arange(s), side="right")
    tot = np.concatenate([[0.0], naive]).astype(np.float32)
    naive_sums = tot[hi] - tot[lo]
    assert np.max(np.abs(naive_sums - want)) > 1.0


def test_uncompensated_counts_exact():
    rng = np.random.default_rng(2)
    n, s = 100000, 3000
    seg = np.sort(rng.integers(0, s, n)).astype(np.int32)
    ones = np.ones(n, np.float32)
    got = np.asarray(segments.sorted_segment_sum(
        jnp.asarray(ones), jnp.asarray(seg), s, compensated=False))
    want = _np_segment_sum(ones[:, None], seg, s)[:, 0]
    np.testing.assert_array_equal(got, want)


def test_segment_first():
    seg = jnp.asarray(np.array([0, 0, 2, 2, 2, 5], np.int32))
    vals = jnp.asarray(np.arange(6, dtype=np.float32)[:, None] * 10)
    lo, hi = segments.segment_boundaries(seg, 6)
    first = np.asarray(segments.sorted_segment_first(vals, seg, 6,
                                                     boundaries=(lo, hi)))
    occupied = np.asarray(lo < hi)
    assert first[0, 0] == 0.0 and first[2, 0] == 20.0 and first[5, 0] == 50.0
    assert list(occupied) == [True, False, True, False, False, True]
