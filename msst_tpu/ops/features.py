"""LOAM edge/planar feature extraction.

TPU rebuild of LIO-SAM's ``featureExtraction`` stage
(``liosam_ws/src/LIO-SAM/src/featureExtraction.cpp``):

* curvature = squared sum of the 11-tap range stencil (``calculateSmoothness``
  :81-101)
* occlusion + parallel-beam rejection (``markOccludedPoints`` :103-139)
* per-ring x 6 azimuth sectors, pick the <=20 highest-curvature unsuppressed
  points above ``edge_threshold`` as corners, with +-5-neighbor column-gated
  non-max suppression; every non-corner sector point is a surface candidate;
  surface cloud voxel-downsampled per ring (``extractFeatures`` :141-238)

Data layout is the per-ring packed ``ExtractedScan`` of
``msst_tpu.ops.range_image``: (N_SCAN, H) arrays + per-ring counts.  The
sequential pick-and-suppress of the reference is a ``lax.scan`` over the 6
sectors (suppression can spill across sector boundaries) with a fixed
20-iteration argmax loop per sector, vmapped over rings.

Deviation (documented): the reference also marks flat (< surf_threshold)
points and their neighbors as "picked" while walking the sector in ascending
curvature order; this only influences later corner picks near sector borders.
We apply that suppression in one vectorized shot rather than sequentially —
over-suppressing a handful of border candidates at most.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .range_image import ExtractedScan

Array = jax.Array

N_SECTORS = 6
MAX_CORNERS_PER_SECTOR = 20


def curvature(scan: ExtractedScan) -> tuple[Array, Array]:
    """(N_SCAN, H) curvature + validity (needs 5 neighbors each side)."""
    n_scan, h = scan.rng.shape
    rng = jnp.where(jnp.isfinite(scan.rng), scan.rng, 0.0)
    # 11-tap: sum(neighbors +-5) - 10 * center
    kernel = jnp.ones((11,), rng.dtype).at[5].set(-10.0)
    diff = jax.vmap(lambda r: jnp.convolve(r, kernel, mode="same"))(rng)
    curv = diff * diff
    pos = jnp.arange(h)[None, :]
    cnt = scan.count[:, None]
    valid = (pos >= 5) & (pos < cnt - 5)
    return jnp.where(valid, curv, 0.0), valid


def mark_occluded(scan: ExtractedScan) -> Array:
    """(N_SCAN, H) bool — True where the point must not seed a feature.

    Occlusion: adjacent points <10 columns apart with range step > 0.3 m mark
    the 6 points on the far side.  Parallel beam: both neighbors differ by
    >2% of range.  (``markOccludedPoints`` :103-139.)
    """
    n_scan, h = scan.rng.shape
    rng = scan.rng
    finite = jnp.isfinite(rng)
    rng0 = jnp.where(finite, rng, 0.0)

    d1 = rng0  # depth at i
    d2 = jnp.roll(rng0, -1, axis=1)  # depth at i+1
    col_diff = jnp.abs(jnp.roll(scan.col, -1, axis=1) - scan.col)
    near = col_diff < 10

    # i occludes i+1 side / vice versa
    a_occ = near & (d1 - d2 > 0.3)  # mark i-5..i
    b_occ = near & (d2 - d1 > 0.3)  # mark i+1..i+6

    picked = jnp.zeros((n_scan, h), bool)
    # a_occ at i marks i-5..i  -> picked[j] |= a_occ[j+s], s=0..5
    for s in range(0, 6):
        picked |= jnp.roll(a_occ, -s, axis=1)
    # b_occ at i marks i+1..i+6 -> picked[j] |= b_occ[j-s], s=1..6
    for s in range(1, 7):
        picked |= jnp.roll(b_occ, s, axis=1)

    diff_prev = jnp.abs(jnp.roll(rng0, 1, axis=1) - rng0)
    diff_next = jnp.abs(jnp.roll(rng0, -1, axis=1) - rng0)
    parallel = (diff_prev > 0.02 * rng0) & (diff_next > 0.02 * rng0)
    picked |= parallel

    pos = jnp.arange(h)[None, :]
    cnt = scan.count[:, None]
    in_range = (pos >= 5) & (pos < cnt - 6)
    return picked & in_range


class FeatureMasks(NamedTuple):
    corner: Array   # (N_SCAN, H) bool
    surface: Array  # (N_SCAN, H) bool (pre-downsample)


def _sector_bounds(count: Array) -> tuple[Array, Array]:
    """Per-sector [sp, ep] (inclusive) inside one ring, matching
    ``extractFeatures`` :156-157 with start=5, end=count-6."""
    j = jnp.arange(N_SECTORS)
    start = 5
    end = count - 6
    sp = (start * (N_SECTORS - j) + end * j) // N_SECTORS
    ep = (start * (N_SECTORS - 1 - j) + end * (j + 1)) // N_SECTORS - 1
    return sp, ep


def _suppress_neighbors(picked: Array, col: Array, ind: Array) -> Array:
    """Mark ind and up to 5 neighbors each side, stopping at column gaps > 10
    (``extractFeatures`` :176-192)."""
    h = picked.shape[0]
    picked = picked.at[ind].set(True)

    def fwd(carry, l):
        picked, alive = carry
        i = ind + l
        ok = alive & (i < h)
        gap = jnp.abs(col[jnp.minimum(i, h - 1)] - col[jnp.minimum(i - 1, h - 1)])
        ok &= gap <= 10
        picked = jnp.where(ok, picked.at[jnp.minimum(i, h - 1)].set(True), picked)
        return (picked, ok), None

    (picked, _), _ = jax.lax.scan(fwd, (picked, True), jnp.arange(1, 6))

    def bwd(carry, l):
        picked, alive = carry
        i = ind - l
        ok = alive & (i >= 0)
        gap = jnp.abs(col[jnp.maximum(i, 0)] - col[jnp.maximum(i + 1, 0)])
        ok &= gap <= 10
        picked = jnp.where(ok, picked.at[jnp.maximum(i, 0)].set(True), picked)
        return (picked, ok), None

    (picked, _), _ = jax.lax.scan(bwd, (picked, True), jnp.arange(1, 6))
    return picked


def extract_features_nms(
    scan: ExtractedScan,
    edge_threshold: float = 1.0,
    surf_threshold: float = 0.1,
) -> FeatureMasks:
    """Vectorized corner selection: non-max suppression over a +-5 window +
    per-sector top-20 cap.

    The reference's greedy pick-highest-then-suppress loop is inherently
    sequential; NMS keeps exactly the candidates that would survive as window
    maxima, which matches the greedy picks except in dense peak chains (and
    ignores the column-gap gating of the suppression window).  ~20 vector ops
    instead of ~1400 sequential ones — the default in the compiled pipeline;
    :func:`extract_features` remains the reference-faithful variant.
    """
    curv, curv_valid = curvature(scan)
    occluded = mark_occluded(scan)
    n_scan, h = scan.rng.shape
    pos = jnp.arange(h)[None, :]

    cand = curv_valid & ~occluded & (curv > edge_threshold)
    # windowed neighbor max (excluding self) over +-5 packed positions
    wmax = jnp.full_like(curv, -jnp.inf)
    for s in range(1, 6):
        wmax = jnp.maximum(wmax, jnp.roll(curv, s, axis=1))
        wmax = jnp.maximum(wmax, jnp.roll(curv, -s, axis=1))
    ismax = cand & (curv >= wmax)

    # per-(ring, sector) top-20 cap in one batched top_k
    sp, ep = jax.vmap(_sector_bounds)(scan.count)        # (R, 6) each
    sec_masks = (pos[None] >= sp[:, :, None]) & (pos[None] <= ep[:, :, None])  # (R, 6, H)
    masked = jnp.where(sec_masks & ismax[:, None, :], curv[:, None, :], -jnp.inf)
    flat = masked.reshape(n_scan * N_SECTORS, h)
    kth = jax.lax.top_k(flat, MAX_CORNERS_PER_SECTOR)[0][:, -1]   # (R*6,)
    kth = kth.reshape(n_scan, N_SECTORS)
    # when a sector holds < 20 candidates the k-th value is -inf: keep all
    keep = masked >= jnp.where(jnp.isfinite(kth), kth, -jnp.inf)[:, :, None]
    corner = jnp.any(keep & jnp.isfinite(masked), axis=1)

    in_sector = jnp.any(sec_masks, axis=1)
    surface = in_sector & ~corner & (pos < scan.count[:, None])
    return FeatureMasks(corner, surface)


def extract_features(
    scan: ExtractedScan,
    edge_threshold: float = 1.0,
    surf_threshold: float = 0.1,
) -> FeatureMasks:
    curv, curv_valid = curvature(scan)
    occluded = mark_occluded(scan)
    h = scan.rng.shape[1]
    pos = jnp.arange(h)

    def one_ring(curv_r, valid_r, occl_r, col_r, count_r):
        sp, ep = _sector_bounds(count_r)

        def sector(carry, j):
            picked = carry
            in_sec = (pos >= sp[j]) & (pos <= ep[j]) & (sp[j] < ep[j])

            def pick(state, _):
                picked, corner = state
                cand = in_sec & ~picked & valid_r & (curv_r > edge_threshold)
                c = jnp.where(cand, curv_r, -jnp.inf)
                ind = jnp.argmax(c)
                ok = c[ind] > -jnp.inf
                corner = jnp.where(ok, corner.at[ind].set(True), corner)
                picked = jnp.where(ok, _suppress_neighbors(picked, col_r, ind), picked)
                return (picked, corner), None

            (picked, corner_s), _ = jax.lax.scan(
                pick,
                (picked, jnp.zeros_like(picked)),
                None,
                length=MAX_CORNERS_PER_SECTOR,
            )
            # Vectorized flat-point suppression (see module docstring):
            flat = in_sec & ~picked & valid_r & (curv_r < surf_threshold)
            spread = flat
            for s in range(1, 6):
                gap_ok_r = jnp.abs(col_r - jnp.roll(col_r, 1)) <= 10
                spread = spread | (jnp.roll(spread, 1) & gap_ok_r) | (
                    jnp.roll(spread, -1) & jnp.roll(gap_ok_r, -1)
                )
            picked = picked | spread
            return picked, (corner_s, in_sec)

        occl_init = occl_r | ~valid_r
        picked_final, (corners, in_secs) = jax.lax.scan(
            sector, occl_init, jnp.arange(N_SECTORS)
        )
        corner_mask = jnp.any(corners, axis=0)
        sector_cover = jnp.any(in_secs, axis=0)
        surf_mask = sector_cover & ~corner_mask & (pos < count_r)
        return corner_mask, surf_mask

    corner, surface = jax.vmap(one_ring)(
        curv, curv_valid, occluded, scan.col, scan.count
    )
    return FeatureMasks(corner, surface)
