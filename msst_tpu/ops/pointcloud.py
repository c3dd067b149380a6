"""Fixed-shape masked point-cloud containers and elementwise filters.

The reference passes ``pcl::PointCloud`` (dynamic size) between nodes; on TPU
clouds are fixed-capacity arrays with a validity mask so every program has
static shapes.  This module provides the container plus the L1 "conditioning"
ops of the reference:

* NaN repair              (``nan_filter_ws/src/nan_filter_node.cpp:29-103``)
* passthrough / box crop  (``fusion_pointclouds.cpp:141-204``)
* intensity / range ROI   (``lidar_target_ws/.../target_detector.cpp:241-330``)
* rigid transform + concat fusion (``lidar_fusion.cpp:157-373``)
* compaction (mask -> dense prefix) — the TPU analogue of pcl's
  ``removeNaNFromPointCloud`` / dynamic push_back.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .se3 import Pose

Array = jax.Array


class Cloud(NamedTuple):
    """Fixed-capacity point cloud.

    xyz:   (N, 3) float32; garbage where ~mask
    mask:  (N,)  bool — validity
    attrs: (N, A) float32 — extra per-point channels (intensity, ring, time...);
           may be zero-width.
    """

    xyz: Array
    mask: Array
    attrs: Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    @staticmethod
    def create(xyz: Array, mask: Optional[Array] = None, attrs: Optional[Array] = None) -> "Cloud":
        n = xyz.shape[0]
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        if attrs is None:
            attrs = jnp.zeros((n, 0), dtype=xyz.dtype)
        return Cloud(xyz.astype(jnp.float32), mask, attrs.astype(jnp.float32))

    @staticmethod
    def empty(capacity: int, n_attrs: int = 0) -> "Cloud":
        return Cloud(
            jnp.zeros((capacity, 3), jnp.float32),
            jnp.zeros((capacity,), bool),
            jnp.zeros((capacity, n_attrs), jnp.float32),
        )

    def with_mask(self, mask: Array) -> "Cloud":
        return self._replace(mask=self.mask & mask)

    def transform(self, pose: Pose) -> "Cloud":
        """Rigid transform preserving attrs (the fusion nodes' per-point
        transform keeps XYZIRT fields, ``lidar_fusion.cpp:157-275``)."""
        return self._replace(xyz=pose.apply(self.xyz))


def nan_repair(cloud: Cloud) -> Cloud:
    """Replace non-finite coordinates with 0 and drop them from the mask.

    Mirrors ``nan_filter_node.cpp:30-50`` which zero-fills non-finite XYZI so
    organized clouds stay dense; here the mask additionally records validity.
    """
    finite = jnp.all(jnp.isfinite(cloud.xyz), axis=-1)
    xyz = jnp.where(finite[:, None], cloud.xyz, 0.0)
    attrs = jnp.where(jnp.isfinite(cloud.attrs), cloud.attrs, 0.0)
    return Cloud(xyz, cloud.mask & finite, attrs)


def crop_box(cloud: Cloud, lo: Array, hi: Array, keep_inside: bool = True) -> Cloud:
    """Axis-aligned box filter.

    keep_inside=True  == the external-bounds passthrough crop
    keep_inside=False == the ego-box carve-out (ConditionalRemoval)
    of ``fusion_pointclouds.cpp:141-204``.
    """
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    inside = jnp.all((cloud.xyz >= lo) & (cloud.xyz <= hi), axis=-1)
    return cloud.with_mask(inside if keep_inside else ~inside)


def range_filter(cloud: Cloud, min_range: float, max_range: float) -> Cloud:
    r = jnp.linalg.norm(cloud.xyz, axis=-1)
    return cloud.with_mask((r >= min_range) & (r <= max_range))


def attr_threshold(cloud: Cloud, attr_index: int, lo: float = -jnp.inf, hi: float = jnp.inf) -> Cloud:
    a = cloud.attrs[:, attr_index]
    return cloud.with_mask((a >= lo) & (a <= hi))


def compact(cloud: Cloud, capacity: Optional[int] = None) -> Cloud:
    """Move valid points to a dense prefix (stable order).  Static output shape
    = `capacity` (default: input capacity).

    Stream compaction via prefix-sum + scatter: each valid row's destination
    is its rank among valid rows (one cumsum, one row scatter) — cheaper than
    the stable argsort-of-mask formulation on TPU, and this runs twice per
    scan in the LIO frontend."""
    n_out = capacity or cloud.capacity
    pos = jnp.cumsum(cloud.mask.astype(jnp.int32)) - 1
    dest = jnp.where(cloud.mask & (pos < n_out), pos, n_out)  # n_out = drop
    xyz = jnp.zeros((n_out, 3), cloud.xyz.dtype).at[dest].set(
        cloud.xyz, mode="drop")
    attrs = jnp.zeros((n_out, cloud.attrs.shape[1]), cloud.attrs.dtype
                      ).at[dest].set(cloud.attrs, mode="drop")
    new_mask = jnp.arange(n_out) < cloud.count
    return Cloud(xyz, new_mask, attrs)


def concat(clouds: Sequence[Cloud], capacity: Optional[int] = None, compacted: bool = True) -> Cloud:
    """Concatenate clouds (multi-LiDAR fusion: transform each into a common
    frame first, then concat; ``lidar_fusion.cpp:277-373``)."""
    xyz = jnp.concatenate([c.xyz for c in clouds], axis=0)
    mask = jnp.concatenate([c.mask for c in clouds], axis=0)
    na = max(c.attrs.shape[1] for c in clouds)
    attrs = jnp.concatenate(
        [
            jnp.pad(c.attrs, ((0, 0), (0, na - c.attrs.shape[1])))
            for c in clouds
        ],
        axis=0,
    )
    out = Cloud(xyz, mask, attrs)
    if compacted:
        out = compact(out, capacity)
    elif capacity is not None and capacity != out.capacity:
        out = compact(out, capacity)
    return out


def fuse(
    clouds: Sequence[Cloud],
    extrinsics: Sequence[Pose],
    capacity: Optional[int] = None,
    bounds_lo: Optional[Array] = None,
    bounds_hi: Optional[Array] = None,
    ego_lo: Optional[Array] = None,
    ego_hi: Optional[Array] = None,
) -> Cloud:
    """Multi-LiDAR fusion: per-child static extrinsic transform, concat, outer
    bounds crop, ego carve-out — the full ``fusion_pointclouds`` node
    (``fusion_pointclouds.cpp:34-204``) as one fused program."""
    moved = [c.transform(p) for c, p in zip(clouds, extrinsics)]
    out = concat(moved, capacity=capacity, compacted=False)
    if bounds_lo is not None:
        out = crop_box(out, bounds_lo, bounds_hi, keep_inside=True)
    if ego_lo is not None:
        out = crop_box(out, ego_lo, ego_hi, keep_inside=False)
    return compact(out, capacity)


def centroid(cloud: Cloud) -> Array:
    w = cloud.mask.astype(cloud.xyz.dtype)[:, None]
    s = jnp.sum(cloud.xyz * w, axis=0)
    return s / jnp.maximum(jnp.sum(w), 1.0)


def transform_to_fixed_frame(xyz: Array, t: Array, pose_times: Array,
                             pose_q: Array, pose_t: Array) -> Array:
    """Re-project points captured at times ``t`` into a fixed frame given a
    pose timeline — the transform-node role
    (``timoo/src/timoo_pointcloud/src/conversions/transform.cc:28-74``: each
    packet is transformed by the TF at its stamp into the fixed frame; the
    TF-listener lookup becomes interpolation on an explicit (times, poses)
    timeline).

    Unlike scan deskew (``frontend``/``range_image``), which interpolates the
    IMU *rotation increment* within one scan and maps points to the scan
    start, this maps arbitrary packet groups through absolute sensor poses
    into one fixed frame — the multi-packet / multi-scan accumulation case.

    xyz: (N, 3); t: (N,) point times; pose_times: (M,) ascending;
    pose_q: (M, 4) wxyz; pose_t: (M, 3).  Pose at each t by linear
    interpolation (slerp for rotation), clamped at the timeline ends.
    """
    from . import se3

    M = pose_times.shape[0]
    j = jnp.clip(jnp.searchsorted(pose_times, t, side="right") - 1, 0, M - 2)
    t0 = pose_times[j]
    t1 = pose_times[j + 1]
    w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    q = se3.quat_slerp(pose_q[j], pose_q[j + 1], w[:, None])
    trans = pose_t[j] * (1.0 - w[:, None]) + pose_t[j + 1] * w[:, None]
    return se3.quat_rotate(q, xyz) + trans
