"""LiDAR-only heading/attitude estimator (mining-tunnel corridor use).

TPU rebuild of ``heading_ws/src/src/HeadingEstimator.cpp`` (processPointCloud
:70-307): per frame —

1. voxel + statistical-outlier pre-filter (:309-323),
2. ground: ROI radius crop -> z-percentile low-point selection -> RANSAC
   plane -> Tukey-weighted refinement -> horizontality check -> roll/pitch
   from the leveling rotation (``estimateGroundAttitude`` :325-415,
   ``computeLevelRotation`` :422-466),
3. walls: transform to the leveled frame, z-band filter, sequential RANSAC
   extraction of up to ``wall_max_planes`` vertical planes (:468-520),
   left/right classification (``isLeftWall`` :720-736),
4. yaw from inlier-weighted wall corridor axes with sign continuity
   (``computeYawFromWalls`` :738-869),
5. 4 wall distances at front/back sample points (``computeWallDistances``
   :871-928),
6. exponential temporal smoothing, yaw smoothed in the vector domain
   (``applyTemporalSmoothing`` :930-1003),
7. quality gates -> high/medium/low confidence with graceful fallback to the
   previous result (:1005-1060, policy :269-292).

The sequential multi-plane extraction runs as a ``lax.scan`` with inlier
masking; all RANSAC hypothesis scoring is batched.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ransac, se3, voxel
from ..ops.pointcloud import Cloud

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HeadingConfig:
    """Mirrors ``heading_ws/src/include/Config.h:14-75``."""

    voxel_size: float = 0.1
    outlier_mean_k: int = 10
    outlier_std_mul: float = 1.0
    # ground
    ground_roi_radius: float = 8.0
    ground_z_percentile: float = 0.2
    ground_ransac_max_iter: int = 200
    ground_ransac_threshold: float = 0.05
    ground_inlier_min: int = 50
    ground_normal_threshold_deg: float = 30.0
    plane_inlier_threshold: float = 0.05
    # walls
    wall_z_min: float = 0.3
    wall_z_max: float = 2.5
    wall_max_planes: int = 4
    wall_inlier_min: int = 50
    wall_vertical_threshold_deg: float = 15.0
    wall_ransac_max_iter: int = 300
    wall_ransac_threshold: float = 0.05
    wall_distance_max: float = 100.0
    side_wall_dot_max: float = 0.7     # |n.forward| below this = side wall
    # sampling / smoothing
    sample_front_dist: float = 2.0
    sample_back_dist: float = -2.0
    temporal_smoothing_tau: float = 0.3
    # capacities (static)
    max_points: int = 16384
    forward_axis: tuple = (1.0, 0.0, 0.0)


class HeadingState(NamedTuple):
    roll: Array
    pitch: Array
    yaw: Array            # degrees, like the reference's output topic
    distances: Array      # (4,) LF, LB, RF, RB; -1 invalid
    corridor_axis: Array  # (3,) previous corridor axis (leveled frame)
    time: Array
    initialized: Array

    @staticmethod
    def create() -> "HeadingState":
        return HeadingState(
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0),
            jnp.full(4, -1.0), jnp.zeros(3), jnp.asarray(0.0),
            jnp.asarray(False),
        )


class HeadingResult(NamedTuple):
    roll: Array       # degrees
    pitch: Array
    yaw: Array
    distances: Array  # (4,)
    confidence: Array  # 2=high, 1=medium, 0=low(previous result held)
    ground_ok: Array
    left_ok: Array
    right_ok: Array


def _level_rotation(n: Array) -> Array:
    """Rotation taking the (up-oriented) ground normal to +z
    (``computeLevelRotation`` :422-466)."""
    z = jnp.array([0.0, 0.0, 1.0])
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
    n = jnp.where(n[2] < 0, -n, n)
    axis = jnp.cross(n, z)
    s = jnp.linalg.norm(axis)
    c = jnp.clip(jnp.dot(n, z), -1.0, 1.0)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-9)
    R = se3.so3_exp_matrix(axis * angle)
    return jnp.where(s < 1e-9, jnp.eye(3), R)


def _masked_percentile(vals: Array, mask: Array, q: Array) -> Array:
    big = jnp.float32(1e9)
    v = jnp.where(mask, vals, big)
    v = jnp.sort(v)
    cnt = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip((cnt.astype(jnp.float32) * q).astype(jnp.int32), 0,
                   vals.shape[0] - 1)
    return v[idx]


@partial(jax.jit, static_argnames=("cfg",))
def heading_step(state: HeadingState, xyz: Array, mask: Array, t: Array,
                 key: Array, cfg: HeadingConfig):
    """One frame; returns (new_state, HeadingResult)."""
    fwd = jnp.asarray(cfg.forward_axis)
    k_ground, k_walls = jax.random.split(key)

    # --- pre-filter
    cloud = Cloud.create(xyz, mask=mask)
    cloud = voxel.voxel_downsample(cloud, cfg.voxel_size, capacity=cfg.max_points)
    keep = ransac.statistical_outlier_mask(
        cloud.xyz, cloud.mask, k=cfg.outlier_mean_k, std_mul=cfg.outlier_std_mul)
    pts, pmask = cloud.xyz, cloud.mask & keep

    # --- ground attitude
    r_xy = jnp.linalg.norm(pts[:, :2], axis=1)
    roi = pmask & (r_xy < cfg.ground_roi_radius)
    z_thr = _masked_percentile(pts[:, 2], roi, cfg.ground_z_percentile)
    low = roi & (pts[:, 2] < z_thr)
    gfit = ransac.fit_plane_robust(
        pts, low, k_ground, cfg.ground_ransac_max_iter,
        cfg.ground_ransac_threshold, cfg.ground_inlier_min,
        tukey_c=cfg.plane_inlier_threshold * 2)
    gn = jnp.where(gfit.normal[2] < 0, -gfit.normal, gfit.normal)
    horizontal = jnp.abs(gn[2]) >= jnp.cos(
        jnp.radians(cfg.ground_normal_threshold_deg))
    ground_ok = gfit.ok & horizontal & (gfit.inlier_count >= cfg.ground_inlier_min)

    R_level = _level_rotation(gn)
    rpy = se3.matrix_to_rpy(R_level)
    roll = jnp.where(ground_ok, jnp.degrees(rpy[0]), state.roll)
    pitch = jnp.where(ground_ok, jnp.degrees(rpy[1]), state.pitch)

    # --- walls in the leveled frame
    lev = pts @ R_level.T
    band = pmask & (lev[:, 2] > cfg.wall_z_min) & (lev[:, 2] < cfg.wall_z_max)
    fwd_lev = R_level @ fwd
    fwd_lev = fwd_lev.at[2].set(0.0)
    fwd_lev = fwd_lev / jnp.maximum(jnp.linalg.norm(fwd_lev), 1e-9)
    left_axis = jnp.cross(jnp.array([0.0, 0.0, 1.0]), fwd_lev)

    sin_vert = jnp.sin(jnp.radians(cfg.wall_vertical_threshold_deg))

    def extract(carry, k):
        remaining = carry
        fit = ransac.ransac_plane(lev, remaining, k, cfg.wall_ransac_max_iter,
                                  cfg.wall_ransac_threshold, cfg.wall_inlier_min)
        vertical = jnp.abs(fit.normal[2]) < sin_vert
        good = fit.ok & (fit.inlier_count >= cfg.wall_inlier_min)
        # remove this plane's inliers either way and keep searching (:468-520)
        remaining = remaining & ~fit.inlier_mask
        rec = (fit.normal, fit.d, fit.inlier_count, good & vertical)
        return remaining, rec

    keys = jax.random.split(k_walls, cfg.wall_max_planes)
    _, (normals, ds, counts, valid) = jax.lax.scan(extract, band, keys)

    # side walls: normal nearly orthogonal to forward
    ndotf = jnp.abs(normals @ fwd_lev)
    side = valid & (ndotf < cfg.side_wall_dot_max)
    # left/right by the nearest plane point's projection on the left axis
    p0 = -ds[:, None] * normals
    proj = p0 @ left_axis
    is_left = side & (proj > 0)
    is_right = side & (proj <= 0)

    def best(maskv):
        c = jnp.where(maskv, counts, -1)
        i = jnp.argmax(c)
        return i, c[i] > 0

    li, left_ok = best(is_left)
    ri, right_ok = best(is_right)
    ln, ld, lc = normals[li], ds[li], counts[li]
    rn, rd, rc = normals[ri], ds[ri], counts[ri]

    # --- yaw from corridor axes (:738-869)
    ref = jnp.where(state.initialized & (jnp.linalg.norm(state.corridor_axis) > 1e-6),
                    state.corridor_axis, left_axis)

    def axis_of(n):
        tax = jnp.cross(jnp.array([0.0, 0.0, 1.0]), n).at[2].set(0.0)
        tax = tax / jnp.maximum(jnp.linalg.norm(tax), 1e-9)
        return jnp.where(jnp.dot(tax, ref) < 0, -tax, tax)

    wl = jnp.where(left_ok, lc.astype(jnp.float32), 0.0)
    wr = jnp.where(right_ok, rc.astype(jnp.float32), 0.0)
    axis = wl * axis_of(ln) + wr * axis_of(rn)
    have_axis = (wl + wr) > 0
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    axis = jnp.where(jnp.dot(axis, ref) < 0, -axis, axis)

    fwd_yaw = jnp.arctan2(fwd_lev[1], fwd_lev[0])
    yaw_rad = jnp.arctan2(axis[1], axis[0]) - fwd_yaw
    yaw_rad = jnp.arctan2(jnp.sin(yaw_rad), jnp.cos(yaw_rad))
    yaw = jnp.where(have_axis, jnp.degrees(yaw_rad), state.yaw)

    # --- wall distances (:871-928)
    pf = cfg.sample_front_dist * fwd_lev
    pb = cfg.sample_back_dist * fwd_lev

    def dists(n, d, ok):
        a = jnp.abs(jnp.dot(n, pf) + d)
        b = jnp.abs(jnp.dot(n, pb) + d)
        bad = (a > cfg.wall_distance_max) | (b > cfg.wall_distance_max) | ~ok
        return jnp.where(bad, -1.0, a), jnp.where(bad, -1.0, b)

    lf, lb = dists(ln, ld, left_ok)
    rf, rb = dists(rn, rd, right_ok)
    distances = jnp.stack([lf, lb, rf, rb])

    # --- temporal smoothing (:930-1003)
    dt = t - state.time
    do_smooth = state.initialized & (dt > 0) & (dt <= 1.0)
    alpha = jnp.where(do_smooth, 1.0 - jnp.exp(-dt / cfg.temporal_smoothing_tau), 1.0)
    roll_s = (1 - alpha) * state.roll + alpha * roll
    pitch_s = (1 - alpha) * state.pitch + alpha * pitch

    cur = fwd_yaw + jnp.radians(yaw)
    prv = fwd_yaw + jnp.radians(state.yaw)
    vec = (1 - alpha) * jnp.array([jnp.cos(prv), jnp.sin(prv)]) + \
        alpha * jnp.array([jnp.cos(cur), jnp.sin(cur)])
    vecn = vec / jnp.maximum(jnp.linalg.norm(vec), 1e-9)
    prev_vec = jnp.array([jnp.cos(prv), jnp.sin(prv)])
    vecn = jnp.where(jnp.dot(vecn, prev_vec) < 0, -vecn, vecn)
    yaw_srad = jnp.arctan2(vecn[1], vecn[0]) - fwd_yaw
    yaw_s = jnp.degrees(jnp.arctan2(jnp.sin(yaw_srad), jnp.cos(yaw_srad)))
    yaw_s = jnp.where(do_smooth, yaw_s, yaw)

    both = (state.distances > 0) & (distances > 0)
    dist_s = jnp.where(both & do_smooth,
                       (1 - alpha) * state.distances + alpha * distances,
                       distances)

    # --- confidence ladder (:1005-1060)
    confidence = jnp.where(
        ground_ok & left_ok & right_ok, 2,
        jnp.where(ground_ok & (left_ok | right_ok), 1, 0))

    new_state = HeadingState(
        roll=roll_s, pitch=pitch_s, yaw=yaw_s, distances=dist_s,
        corridor_axis=jnp.where(have_axis, axis, state.corridor_axis),
        time=t, initialized=jnp.asarray(True),
    )
    result = HeadingResult(roll_s, pitch_s, yaw_s, dist_s, confidence,
                           ground_ok, left_ok, right_ok)
    return new_state, result
