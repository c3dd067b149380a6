"""Deterministic voxel-grid downsampling on fixed-shape clouds.

Replaces every ``pcl::VoxelGrid`` call site in the reference (feature-cloud
downsampling ``featureExtraction.cpp:232-236``, map/scan downsampling
``mapOptmization.cpp:955-967``, local-map assembly :862-938, calibration
pre-filters).  PCL computes the centroid of all points per occupied voxel; we
do the same with a sort + segment-sum, which is exact (no hash collisions:
we sort lexicographically on integer voxel coordinates) and deterministic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import segments
from .pointcloud import Cloud

Array = jax.Array

_BIG = jnp.int32(2**30)


def voxel_coords(xyz: Array, leaf: float) -> Array:
    return jnp.floor(xyz / leaf).astype(jnp.int32)


def voxel_downsample(
    cloud: Cloud,
    leaf: float,
    capacity: Optional[int] = None,
    extra_key: Optional[Array] = None,
    uniform_overflow: bool = True,
    return_stats: bool = False,
) -> Cloud:
    """Centroid voxel filter.

    extra_key: optional (N,) int32 appended to the voxel key — e.g. the ring
    index, to reproduce the reference's *per-ring* surface downsampling
    (``featureExtraction.cpp:226-236`` runs one VoxelGrid per ring).
    capacity: static output size (default: input capacity).  If more voxels
    are occupied than capacity, a spatially-uniform pseudo-random subset
    survives (voxels are ordered by a hash of their cell coordinate, so
    overflow thins the cloud evenly instead of chopping off one side).
    uniform_overflow=False drops that hash key (overflow then chops the
    highest cell keys) — pass it at call sites where overflow is impossible
    (output capacity >= input capacity), saving a sort operand.

    The sort cost on TPU scales with operand count, so (extra, cx, cy) pack
    into ONE int key: extra in [0, 127] (7 bits — callers passing ring ids
    must keep n_scan <= 128; larger values silently merge rings), cx/cy
    clamped to +-1024 cells (11 bits each).  The cell coords are RE-CENTERED
    on the first valid point's cell before packing, so the +-1024-cell domain
    (+-205 m at the 0.2 m mapping leaf, +-410 m at the 0.4 m loop leaf) bounds
    the cloud's spatial EXTENT, not its distance from the world origin —
    world-frame submaps hundreds of meters into a trajectory (loop closure,
    multi-session merge, map save) downsample exactly.  Only points farther
    than the domain from the cloud's own first point collapse into boundary
    cells.  cz rides a second key, unclamped.
    """
    n = cloud.capacity
    n_out = capacity or n
    c = voxel_coords(cloud.xyz, leaf)
    invalid = ~cloud.mask
    # per-call origin: the first valid point's cell (argmax of the mask is
    # the first True; an all-invalid cloud yields garbage that the sentinel
    # keys mask out anyway).  Voxel-cell identity is translation-invariant
    # in integer cells, so in-domain grouping and centroids are unchanged.
    origin_cell = c[jnp.argmax(cloud.mask)]
    c = c - origin_cell
    cxy = jnp.clip(c[:, :2], -1024, 1023)
    if extra_key is not None:
        extra = jnp.clip(extra_key.astype(jnp.int32), 0, 127)
    else:
        extra = jnp.int32(0)
    hi = (extra << 22) | ((cxy[:, 0] + 1024) << 11) | (cxy[:, 1] + 1024)
    hi = jnp.where(invalid, jnp.int32(2**31 - 1), hi)
    lo = c[:, 2]
    if uniform_overflow:
        # spatial hash as the primary order ((hi, lo) as tiebreakers keep
        # distinct voxels separate under collisions); invalid points sort
        # last.  The hash input is the clamped-relative cell shifted BACK
        # to absolute — still a pure function of (hi, lo) (so clamped
        # groups stay mergeable), and for every in-domain point it equals
        # the world-space cell: survivor selection is then independent of
        # which point happened to be first valid (the re-centering
        # origin), so two packings/layouts of the same scene thin
        # identically (a re-centered hash made the thinning
        # origin-sensitive; caught by the grid-jitter divergence test).
        ha = cxy[:, 0] + origin_cell[0]
        hb = cxy[:, 1] + origin_cell[1]
        hc = lo + origin_cell[2]
        h = (ha * jnp.int32(73856093)
             ^ hb * jnp.int32(19349663)
             ^ hc * jnp.int32(83492791))
        h = jnp.where(invalid, jnp.int32(2**31 - 1), h)
        keys = [h, hi, lo]
    else:
        keys = [hi, lo]
    # Demeaned-by-cell-center residuals computed BEFORE the sort (they ride
    # the sort network like any value operand) and CLIPPED to half a leaf:
    # in-domain points are unaffected (their residual is <= leaf/2 by
    # construction), while clamped far points collapse onto their boundary
    # cell instead of poisoning the shared prefix sums with huge residuals
    # (segments.py explains why unbounded prefixes of metric coords are
    # unusable in f32).
    cell = jnp.concatenate([cxy, c[:, 2:3]], axis=1) + origin_cell
    center = (cell.astype(cloud.xyz.dtype) + 0.5) * leaf
    r = jnp.clip(cloud.xyz - center, -0.5 * leaf, 0.5 * leaf)

    # one multi-operand sort (primary key first): the values ride the sort
    # network instead of being re-gathered by an argsort permutation — the
    # same rewrite as voxel_downsample_packed, ~2x at scan sizes on v5e
    A = cloud.attrs.shape[1]
    sorted_ops = jax.lax.sort(
        (*keys, r[:, 0], r[:, 1], r[:, 2],
         *(cloud.attrs[:, j] for j in range(A))),
        num_keys=len(keys))
    nk = len(keys)
    hi_s, lo_s = sorted_ops[nk - 2], sorted_ops[nk - 1]
    valid_s = hi_s != jnp.int32(2**31 - 1)
    r_sorted = jnp.stack(sorted_ops[nk:nk + 3], axis=1)
    attrs_s = (jnp.stack(sorted_ops[nk + 3:], axis=1) if A
               else cloud.attrs)

    # (hi, lo) identifies the group; the hash is a function of it
    new_voxel = ((hi_s != jnp.roll(hi_s, 1))
                 | (lo_s != jnp.roll(lo_s, 1)))
    new_voxel = new_voxel.at[0].set(True)
    new_voxel = new_voxel & valid_s
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1  # voxel index per point
    seg = jnp.where(valid_s, seg, n_out)  # invalid points -> dropped segment

    cell_s = jnp.stack([((hi_s >> 11) & 2047) - 1024,
                        (hi_s & 2047) - 1024, lo_s], axis=1) + origin_cell
    w = valid_s.astype(r_sorted.dtype)[:, None]
    r_s = r_sorted * w
    bounds = segments.segment_boundaries(seg, n_out)
    vals = segments.sorted_segment_sum(
        jnp.concatenate([r_s, attrs_s * w, w], axis=1), seg, n_out,
        boundaries=bounds, compensated=False)
    rsums, asums, counts = vals[:, :3], vals[:, 3:-1], vals[:, -1]
    cell_v = segments.sorted_segment_first(cell_s, seg, n_out,
                                           boundaries=bounds)
    center_v = (cell_v.astype(r_sorted.dtype) + 0.5) * leaf

    denom = jnp.maximum(counts, 1.0)[:, None]
    n_voxels = jnp.sum(new_voxel.astype(jnp.int32))
    mask_out = jnp.arange(n_out) < jnp.minimum(n_voxels, n_out)
    out = Cloud(center_v + rsums / denom, mask_out, asums / denom)
    if return_stats:
        # occupied voxels that did NOT fit the output capacity — surfaced
        # so capped call sites can report saturation (VERDICT r4 #6)
        return out, jnp.maximum(n_voxels - n_out, 0)
    return out


def voxel_downsample_packed(
    cloud: Cloud,
    leaf: float,
    origin: Array,
    capacity: Optional[int] = None,
    half_extent_cells: int = 512,
) -> Cloud:
    """Centroid voxel filter with a single packed int32 sort key.

    Equivalent to :func:`voxel_downsample` for clouds within
    ``half_extent_cells * leaf`` of `origin` (points outside are dropped) —
    one int32 argsort instead of a 4-key lexsort, which is the difference
    between a usable and an unusable keyframe-insertion latency on the
    262k-point local-map gathers.  No spatial-hash survivor shuffling is
    needed: the packed domain caps the voxel count structurally.
    """
    n = cloud.capacity
    n_out = capacity or n
    he = half_extent_cells
    c = jnp.floor((cloud.xyz - origin) / leaf).astype(jnp.int32) + he
    in_range = jnp.all((c >= 0) & (c < 2 * he), axis=1)
    ok = cloud.mask & in_range
    key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
    key = jnp.where(ok, key, jnp.int32(2**30))
    # multi-operand sort carries the values with the key — no argsort and no
    # (N, 3) random row-gathers afterwards (each such gather is ~2.4 ms at
    # 262k rows on v5e; the sort network moves the extra operands for much
    # less).  Validity rides in the key (sentinel 2^30 sorts last).
    A = cloud.attrs.shape[1]
    sorted_ops = jax.lax.sort(
        (key, cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2],
         *(cloud.attrs[:, j] for j in range(A))),
        num_keys=1)
    key_s = sorted_ops[0]
    xyz_s = jnp.stack(sorted_ops[1:4], axis=1)
    attrs_s = (jnp.stack(sorted_ops[4:], axis=1) if A
               else cloud.attrs)
    valid_s = key_s < jnp.int32(2**30)

    new_voxel = key_s != jnp.roll(key_s, 1)
    new_voxel = new_voxel.at[0].set(True) & valid_s
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, n_out)

    # Demean positions by each point's CELL CENTER before the prefix-sum
    # reduction: residuals are <= leaf/2, so a plain (fast) cumsum keeps
    # full precision regardless of how far the cloud sits from the origin
    # (segments.py explains why naive prefixes of raw coords are unusable).
    # Cell centers decode from the packed key, for points and voxels alike.
    def decode_center(k):
        cxyz = jnp.stack([(k >> 20) & 1023, (k >> 10) & 1023, k & 1023],
                         axis=-1)
        return origin + (cxyz.astype(xyz_s.dtype) - he + 0.5) * leaf

    w = valid_s.astype(xyz_s.dtype)[:, None]
    r_s = (xyz_s - decode_center(key_s)) * w
    bounds = segments.segment_boundaries(seg, n_out)
    vals = segments.sorted_segment_sum(
        jnp.concatenate([r_s, attrs_s * w, w], axis=1), seg, n_out,
        boundaries=bounds, compensated=False)
    rsums, asums, counts = vals[:, :3], vals[:, 3:-1], vals[:, -1]
    center_v = decode_center(segments.sorted_segment_first(key_s, seg, n_out,
                                                           boundaries=bounds))
    denom = jnp.maximum(counts, 1.0)[:, None]
    n_voxels = jnp.sum(new_voxel.astype(jnp.int32))
    mask_out = jnp.arange(n_out) < jnp.minimum(n_voxels, n_out)
    return Cloud(center_v + rsums / denom, mask_out, asums / denom)


def voxel_downsample_first(
    cloud: Cloud, leaf: float, capacity: Optional[int] = None
) -> Cloud:
    """Keep the first (in input order) point of each voxel — cheaper than the
    centroid filter; used where the reference's behavior doesn't depend on
    centroid semantics (e.g. candidate thinning)."""
    n_out = capacity or cloud.capacity
    c = voxel_coords(cloud.xyz, leaf)
    invalid = ~cloud.mask
    cx = jnp.where(invalid, _BIG, c[:, 0])
    cy = jnp.where(invalid, _BIG, c[:, 1])
    cz = jnp.where(invalid, _BIG, c[:, 2])
    idx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    order = jnp.lexsort([idx, cz, cy, cx])
    cs = jnp.stack([k[order] for k in (cz, cy, cx)], axis=1)
    valid_s = cloud.mask[order]
    first = jnp.any(cs != jnp.roll(cs, 1, axis=0), axis=1)
    first = first.at[0].set(True)
    first = first & valid_s
    keep_idx = jnp.where(first, order, cloud.capacity + 1)
    keep_idx = jnp.sort(keep_idx)[:n_out]  # preserve input order
    ok = keep_idx <= cloud.capacity
    keep_idx = jnp.minimum(keep_idx, cloud.capacity - 1)
    return Cloud(cloud.xyz[keep_idx], ok, cloud.attrs[keep_idx])
