"""Sorted-segment reductions without scatter.

TPU scatter (``jax.ops.segment_sum``) costs ~10 ms per 262k-row reduction on
v5e — it dominates the local-map rebuild (see docs/DESIGN.md round-2 profile).
Every segment reduction in this codebase runs on rows ALREADY SORTED by
segment id (the voxel pipelines sort by packed cell key first), so a segment
sum is just a difference of prefix sums at the segment boundaries:

    sum_s = prefix[hi_s] - prefix[lo_s],   lo/hi = searchsorted(seg, s)

One associative scan + two boundary gathers replaces the scatter.

Naive f32 prefixes lose ~ULP(total) per segment (ULP(5e7) = 4 — useless for
metric coordinates), so the scan runs in double-single ("TwoSum" compensated)
arithmetic: the carried pair (s, c) represents s + c with ~2^-48 relative
error, and the boundary subtraction's own rounding is relative to the SEGMENT
sum, not the prefix.  Parity with scatter segment_sum is ~1e-4 absolute on
262k-row metric workloads (tests/test_segments.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _twosum(a: Array, b: Array) -> tuple[Array, Array]:
    """Error-free transform: a + b = s + err exactly (Knuth TwoSum)."""
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def _combine(x, y):
    s, e = _twosum(x[0], y[0])
    return s, x[1] + y[1] + e


def compensated_cumsum_pair(vals: Array, axis: int = 0
                            ) -> tuple[Array, Array]:
    """Inclusive prefix sum as a double-single (hi, lo) pair (~f64 accuracy
    from f32 inputs).  Consumers MUST difference the pair components
    separately — collapsing hi + lo first re-rounds at prefix magnitude and
    loses everything the compensation bought."""
    return jax.lax.associative_scan(
        _combine, (vals, jnp.zeros_like(vals)), axis=axis)


def compensated_cumsum(vals: Array, axis: int = 0) -> Array:
    s, c = compensated_cumsum_pair(vals, axis=axis)
    return s + c


def segment_boundaries(seg: Array, num_segments: int) -> tuple[Array, Array]:
    """(lo, hi) row ranges per segment id.

    ``seg`` must be non-decreasing (gaps allowed — empty ids get lo == hi);
    rows to exclude carry an id >= num_segments (sorted to the end).
    Implemented as ONE scatter of each segment's last-row position + a
    cumulative max — ``jnp.searchsorted`` is a ~18-step dependent-gather
    chain that costs 13 ms at (49k queries, 262k rows) on v5e, vs <1 ms for
    the scatter."""
    n = seg.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_last = jnp.concatenate(
        [seg[1:] != seg[:-1], jnp.ones((1,), bool)])
    tgt = jnp.where(is_last & (seg >= 0) & (seg < num_segments),
                    seg, num_segments)
    last = jnp.full(num_segments, -1, jnp.int32).at[tgt].set(
        pos, mode="drop")
    # empty ids (past the last occupied segment) scatter nothing: carry the
    # running end forward so lo == hi there
    hi = jax.lax.cummax(last + 1)
    lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), hi[:-1]])
    return lo, hi


def sorted_segment_sum(vals: Array, seg: Array, num_segments: int,
                       boundaries: tuple[Array, Array] | None = None,
                       compensated: bool = True) -> Array:
    """segment_sum for non-decreasing ``seg`` via prefix differences.

    vals: (N,) or (N, C).  Returns (num_segments,) or (num_segments, C).
    compensated=False uses a plain cumsum — exact for small-integer-valued
    channels (counts/flags up to 2^24), cheaper by the carry channel.
    """
    squeeze = vals.ndim == 1
    v = vals[:, None] if squeeze else vals
    lo, hi = boundaries or segment_boundaries(seg, num_segments)
    zrow = jnp.zeros((1, v.shape[1]), v.dtype)
    if compensated:
        ps, pc = compensated_cumsum_pair(v)
        ps = jnp.concatenate([zrow, ps], axis=0)
        pc = jnp.concatenate([zrow, pc], axis=0)
        # difference each pair component separately: hi-hi cancellation is
        # benign (rounding relative to the SEGMENT sum), hi+lo first is not
        out = (ps[hi] - ps[lo]) + (pc[hi] - pc[lo])
    else:
        tot = jnp.concatenate([zrow, jnp.cumsum(v, axis=0)], axis=0)
        out = tot[hi] - tot[lo]
    return out[:, 0] if squeeze else out


def sorted_segment_first(vals: Array, seg: Array, num_segments: int,
                         boundaries: tuple[Array, Array] | None = None
                         ) -> Array:
    """First row of each segment (e.g. the shared voxel coordinate).  Empty
    segments return row `lo` clipped in-range — mask with lo < hi."""
    lo, hi = boundaries or segment_boundaries(seg, num_segments)
    return vals[jnp.minimum(lo, vals.shape[0] - 1)]
