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
) -> Cloud:
    """Centroid voxel filter.

    extra_key: optional (N,) int32 appended to the voxel key — e.g. the ring
    index, to reproduce the reference's *per-ring* surface downsampling
    (``featureExtraction.cpp:226-236`` runs one VoxelGrid per ring).
    capacity: static output size (default: input capacity).  If more voxels
    are occupied than capacity, a spatially-uniform pseudo-random subset
    survives (voxels are ordered by a hash of their cell coordinate, so
    overflow thins the cloud evenly instead of chopping off one side).
    """
    n = cloud.capacity
    n_out = capacity or n
    c = voxel_coords(cloud.xyz, leaf)
    invalid = ~cloud.mask
    cx = jnp.where(invalid, _BIG, c[:, 0])
    cy = jnp.where(invalid, _BIG, c[:, 1])
    cz = jnp.where(invalid, _BIG, c[:, 2])
    # spatial hash as the primary order (coords as tiebreakers keep distinct
    # voxels separate under hash collisions); invalid points sort last
    h = (c[:, 0] * jnp.int32(73856093)
         ^ c[:, 1] * jnp.int32(19349663)
         ^ c[:, 2] * jnp.int32(83492791))
    h = jnp.where(invalid, jnp.int32(2**31 - 1), h)
    keys = [h]
    if extra_key is not None:
        keys.append(jnp.where(invalid, _BIG, extra_key))
    keys += [cx, cy, cz]
    # one multi-operand sort (primary key first): the values ride the sort
    # network instead of being re-gathered by an argsort permutation — the
    # same rewrite as voxel_downsample_packed, ~2x at scan sizes on v5e
    A = cloud.attrs.shape[1]
    sorted_ops = jax.lax.sort(
        (*keys, cloud.mask, cloud.xyz[:, 0], cloud.xyz[:, 1],
         cloud.xyz[:, 2], *(cloud.attrs[:, j] for j in range(A))),
        num_keys=len(keys))
    nk = len(keys)
    cs = jnp.stack(sorted_ops[:nk], axis=1)           # (N, K) sorted keys
    valid_s = sorted_ops[nk]
    xyz_s = jnp.stack(sorted_ops[nk + 1:nk + 4], axis=1)
    attrs_s = (jnp.stack(sorted_ops[nk + 4:], axis=1) if A
               else cloud.attrs)

    new_voxel = jnp.any(cs != jnp.roll(cs, 1, axis=0), axis=1)
    new_voxel = new_voxel.at[0].set(True)
    new_voxel = new_voxel & valid_s
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1  # voxel index per point
    seg = jnp.where(valid_s, seg, n_out)  # invalid points -> dropped segment

    # Demeaned-by-cell-center residual sums via plain prefix scans: exact
    # where it matters, fast everywhere (see voxel_downsample_packed /
    # segments.py).  The last 3 key columns are (cx, cy, cz).
    cell_s = cs[:, nk - 3:nk]
    center_s = (cell_s.astype(xyz_s.dtype) + 0.5) * leaf
    w = valid_s.astype(xyz_s.dtype)[:, None]
    r_s = (xyz_s - center_s) * w
    bounds = segments.segment_boundaries(seg, n_out)
    vals = segments.sorted_segment_sum(
        jnp.concatenate([r_s, attrs_s * w, w], axis=1), seg, n_out,
        boundaries=bounds, compensated=False)
    rsums, asums, counts = vals[:, :3], vals[:, 3:-1], vals[:, -1]
    cell_v = segments.sorted_segment_first(cell_s, seg, n_out,
                                           boundaries=bounds)
    center_v = (cell_v.astype(xyz_s.dtype) + 0.5) * leaf

    denom = jnp.maximum(counts, 1.0)[:, None]
    n_voxels = jnp.sum(new_voxel.astype(jnp.int32))
    mask_out = jnp.arange(n_out) < jnp.minimum(n_voxels, n_out)
    return Cloud(center_v + rsums / denom, mask_out, asums / denom)


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
