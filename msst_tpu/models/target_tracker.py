"""Reflective-target detection + tracking.

TPU rebuild of the two target trackers in ``lidar_target_ws/``:

* ``lidar_target01`` — intensity threshold -> range/height ROI -> gate around
  the last track -> Euclidean clustering -> RANSAC 3-point circle fit ->
  constant-velocity Kalman filter (``node.cpp:183-420``, ``circle_fit.cpp``);
* ``lidar_target02`` — same front-end with a least-squares algebraic circle
  fit, candidate scoring by residual + distance-to-last-track
  (``target_detector.cpp:241-430,308-356``), 4-state KF (:21-81).

Both fit methods are provided (``method="ransac" | "algebraic"``).  PCL's
EuclideanClusterExtraction becomes a fixed-iteration min-label propagation
over the kNN graph (connected components within ``cluster_tolerance``).
The Modbus-TCP output server lives host-side in ``msst_tpu.utils.modbus``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import kalman, knn, ransac

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TargetConfig:
    intensity_min: float = 120.0
    range_min: float = 0.5
    range_max: float = 30.0
    z_min: float = -0.5
    z_max: float = 2.0
    gate_radius: float = 1.5          # search gate around the last track
    cluster_tolerance: float = 0.2
    cluster_min_points: int = 5
    cluster_max_points: int = 200
    max_candidates: int = 8
    fit_method: str = "algebraic"     # or "ransac"
    circle_radius_range: tuple = (0.02, 0.5)
    circle_threshold: float = 0.03
    max_fit_error: float = 0.05
    kf_q: float = 0.01
    kf_r: float = 0.05
    track_score_dist_weight: float = 0.5  # target02 scoring :308-356
    max_points: int = 1024            # capacity after filtering
    label_prop_iters: int = 16


class TrackerState(NamedTuple):
    kf: kalman.KalmanState
    tracking: Array       # () bool
    misses: Array         # consecutive frames without detection
    time: Array

    @staticmethod
    def create() -> "TrackerState":
        return TrackerState(kalman.KalmanState.create(), jnp.asarray(False),
                            jnp.asarray(0, jnp.int32), jnp.asarray(0.0))


class TargetOutput(NamedTuple):
    """Mirrors ``TargetPosition.msg`` (x, y, distance, point_count, is_valid)
    + filtered track position."""

    x: Array
    y: Array
    distance: Array
    point_count: Array
    is_valid: Array
    track_x: Array
    track_y: Array


def _cluster_labels(xy: Array, mask: Array, tol: float, iters: int,
                    table_size: int = 2048) -> Array:
    """Connected components within `tol` by iterative min-label propagation
    over the 8-NN graph (EuclideanClusterExtraction equivalent)."""
    n = xy.shape[0]
    xyz = jnp.concatenate([xy, jnp.zeros((n, 1))], axis=1)
    grid = knn.build(xyz, mask, cell_size=tol, table_size=table_size)
    res = knn.query(grid, xyz, mask, k=8, candidates_per_cell=16,
                    max_sqdist=tol * tol)
    nbr = jnp.where(res.valid, res.idx, n)          # (N, 8)
    labels0 = jnp.where(mask, jnp.arange(n), n)

    def body(_, labels):
        ext = jnp.concatenate([labels, jnp.array([n])])
        nl = jnp.min(ext[nbr], axis=1)
        return jnp.where(mask, jnp.minimum(labels, nl), n)

    return jax.lax.fori_loop(0, iters, body, labels0)


@partial(jax.jit, static_argnames=("cfg",))
def track_step(state: TrackerState, xyz: Array, intensity: Array, mask: Array,
               t: Array, key: Array, cfg: TargetConfig):
    """One frame; xyz (N, 3) capped at cfg.max_points. Returns
    (new_state, TargetOutput)."""
    n = xyz.shape[0]
    rng = jnp.linalg.norm(xyz[:, :2], axis=1)
    keep = (mask & (intensity >= cfg.intensity_min)
            & (rng >= cfg.range_min) & (rng <= cfg.range_max)
            & (xyz[:, 2] >= cfg.z_min) & (xyz[:, 2] <= cfg.z_max))

    # gate around predicted track position when tracking (:241-330)
    dt = jnp.maximum(t - state.time, 0.0)
    pred = kalman.predict(state.kf, dt, cfg.kf_q)
    gate_ok = jnp.linalg.norm(xyz[:, :2] - pred.x[:2], axis=1) < cfg.gate_radius
    keep = keep & jnp.where(state.tracking, gate_ok, True)

    xy = xyz[:, :2]
    labels = _cluster_labels(xy, keep, cfg.cluster_tolerance,
                             cfg.label_prop_iters)

    # candidate clusters = most frequent labels
    label_count = jnp.zeros(n + 1, jnp.int32).at[labels].add(1)[:n]
    # representative labels: a label is "root" if label[i] == i
    is_root = (labels == jnp.arange(n)) & keep
    size_ok = (label_count >= cfg.cluster_min_points) & (
        label_count <= cfg.cluster_max_points)
    root_score = jnp.where(is_root & size_ok, label_count, 0)
    _, top_roots = jax.lax.top_k(root_score, cfg.max_candidates)

    def fit_candidate(root):
        cm = keep & (labels == root)
        cnt = jnp.sum(cm)
        if cfg.fit_method == "ransac":
            fit = ransac.ransac_circle(
                xy, cm, key, max_iters=400, threshold=cfg.circle_threshold,
                radius_range=cfg.circle_radius_range,
                min_inliers=cfg.cluster_min_points)
        else:
            fit = ransac.fit_circle_algebraic(xy, cm)
        r_ok = (fit.radius >= cfg.circle_radius_range[0]) & (
            fit.radius <= cfg.circle_radius_range[1])
        ok = fit.ok & r_ok & (fit.mean_error < cfg.max_fit_error) & (
            cnt >= cfg.cluster_min_points)
        # scoring: residual + distance to last track (:308-356)
        dist_pen = jnp.where(
            state.tracking,
            cfg.track_score_dist_weight * jnp.linalg.norm(fit.center - pred.x[:2]),
            0.0)
        score = jnp.where(ok, fit.mean_error + dist_pen, jnp.inf)
        return score, fit.center, cnt

    scores, centers, cnts = jax.vmap(fit_candidate)(top_roots)
    best = jnp.argmin(scores)
    detected = jnp.isfinite(scores[best])
    center = centers[best]
    cnt = cnts[best]

    def on_hit():
        kf2 = kalman.update(pred, center, cfg.kf_r)
        return TrackerState(kf2, jnp.asarray(True), jnp.asarray(0, jnp.int32), t)

    def on_miss():
        lost = state.misses + 1 >= 10
        return TrackerState(
            jax.lax.cond(lost, lambda: kalman.KalmanState.create(), lambda: pred),
            state.tracking & ~lost, state.misses + 1, t)

    new_state = jax.lax.cond(detected, on_hit, on_miss)
    tx, ty = new_state.kf.x[0], new_state.kf.x[1]
    out = TargetOutput(
        x=center[0], y=center[1],
        distance=jnp.linalg.norm(center),
        point_count=cnt, is_valid=detected,
        track_x=tx, track_y=ty,
    )
    return new_state, out
