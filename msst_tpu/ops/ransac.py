"""Batched-hypothesis RANSAC + robust refinement kernels.

TPU rebuild of the RANSAC/IRLS toolbox used across the reference:

* plane RANSAC + Tukey-weighted LSQ refinement — the heading estimator's
  ground/wall extraction (``heading_ws/src/src/PointCloudProcessing.cpp``:
  ``ransacPlane``/``computeTukeyWeights``/``refinePlaneWeighted``) and the
  auto-calibrator's ground extraction
  (``SensorsCalibration/lidar2lidar/auto_calib/src/calibration.cpp:241-269``);
* 3-point circle RANSAC with radius constraint — the reflective-target
  tracker (``lidar_target_ws/lidar_target01/src/src/circle_fit.cpp:8-101``);
* algebraic least-squares circle fit ((M^T M)^-1 M^T b) — the second tracker
  (``lidar_target02/src/target_detector.cpp:538-603``);
* statistical outlier removal (mean-kNN-distance gate) — heading estimator
  pre-filter (pcl::StatisticalOutlierRemoval).

RANSAC on TPU evaluates ALL hypotheses against ALL points as one dense
(H, N) computation — batched hypothesis scoring replaces the sequential
sample-and-test loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn

Array = jax.Array


class PlaneFit(NamedTuple):
    normal: Array       # (3,) unit
    d: Array            # () plane offset: n.x + d = 0
    inlier_count: Array
    inlier_mask: Array  # (N,)
    rms: Array
    ok: Array


def _plane_from_3pts(p0, p1, p2, eps=1e-9):
    n = jnp.cross(p1 - p0, p2 - p0)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, eps)
    d = -jnp.sum(n * p0, axis=-1)
    return n, d, nn[..., 0] > eps


def ransac_plane(
    xyz: Array, mask: Array, key: Array,
    max_iters: int = 200, threshold: float = 0.05,
    min_inliers: int = 10,
) -> PlaneFit:
    """Batched plane RANSAC: max_iters hypotheses scored in parallel."""
    n = xyz.shape[0]
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    # sample 3 distinct-ish indices per hypothesis among the valid prefix-agnostic
    ks = jax.random.split(key, 3)
    # draw from valid points: sample positions weighted by mask
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(max_iters,), p=probs)
    )(jnp.stack(ks))  # (3, H)
    p0, p1, p2 = xyz[idx[0]], xyz[idx[1]], xyz[idx[2]]
    nrm, d, valid_h = _plane_from_3pts(p0, p1, p2)          # (H, 3), (H,)

    dist = jnp.abs(xyz @ nrm.T + d[None, :])                # (N, H)
    inl = (dist < threshold) & mask[:, None]
    counts = jnp.sum(inl, axis=0)                           # (H,)
    counts = jnp.where(valid_h, counts, -1)
    best = jnp.argmax(counts)

    normal, dd = nrm[best], d[best]
    inlier_mask = inl[:, best]
    count = counts[best]
    resid = (xyz @ normal + dd) * inlier_mask
    rms = jnp.sqrt(jnp.sum(resid * resid) / jnp.maximum(count, 1))
    ok = count >= min_inliers
    return PlaneFit(normal, dd, count, inlier_mask, rms, ok)


def tukey_weights(xyz: Array, mask: Array, normal: Array, d: Array,
                  c: float = 0.1) -> Array:
    """Tukey biweight per point from plane residuals
    (``computeTukeyWeights``)."""
    r = xyz @ normal + d
    u = r / c
    w = jnp.where(jnp.abs(u) < 1.0, (1.0 - u * u) ** 2, 0.0)
    return w * mask.astype(w.dtype)


def refine_plane_weighted(xyz: Array, w: Array) -> tuple[Array, Array]:
    """Weighted TLS plane: centroid + smallest eigenvector of the weighted
    covariance (``refinePlaneWeighted``)."""
    from . import linalg

    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(xyz * w[:, None], axis=0) / wsum
    dev = (xyz - c) * jnp.sqrt(w)[:, None]
    cov = dev.T @ dev / wsum
    _, vecs = linalg.sym3x3_eigh(cov)
    normal = vecs[0]
    d = -jnp.dot(normal, c)
    return normal, d


def fit_plane_robust(xyz: Array, mask: Array, key: Array,
                     max_iters: int = 200, threshold: float = 0.05,
                     min_inliers: int = 10, irls_rounds: int = 3,
                     tukey_c: float = 0.1) -> PlaneFit:
    """RANSAC + Tukey IRLS refinement, the full heading-estimator recipe
    (``estimateGroundAttitude`` ``HeadingEstimator.cpp:325-415``)."""
    fit = ransac_plane(xyz, mask, key, max_iters, threshold, min_inliers)

    def one_round(_, nd):
        normal, d = nd
        w = tukey_weights(xyz, mask & fit.inlier_mask, normal, d, tukey_c)
        return refine_plane_weighted(xyz, w)

    normal, d = jax.lax.fori_loop(0, irls_rounds, one_round, (fit.normal, fit.d))
    # keep orientation consistent with the RANSAC result
    flip = jnp.dot(normal, fit.normal) < 0
    normal = jnp.where(flip, -normal, normal)
    d = jnp.where(flip, -d, d)
    resid = (xyz @ normal + d)
    inl = (jnp.abs(resid) < threshold) & mask
    count = jnp.sum(inl)
    rms = jnp.sqrt(jnp.sum(jnp.where(inl, resid * resid, 0.0)) / jnp.maximum(count, 1))
    return PlaneFit(normal, d, count, inl, rms, fit.ok)


# ---------------------------------------------------------------------------
# circles (reflective-target detection)
# ---------------------------------------------------------------------------


class CircleFit(NamedTuple):
    center: Array       # (2,)
    radius: Array
    inlier_count: Array
    mean_error: Array
    ok: Array


def _circle_from_3pts(p0, p1, p2, eps=1e-9):
    """Circumcircle of 3 2D points (batched)."""
    ax, ay = p0[..., 0], p0[..., 1]
    bx, by = p1[..., 0], p1[..., 1]
    cx, cy = p2[..., 0], p2[..., 1]
    dd = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ok = jnp.abs(dd) > eps
    dd = jnp.where(ok, dd, 1.0)
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
          + (cx**2 + cy**2) * (ay - by)) / dd
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
          + (cx**2 + cy**2) * (bx - ax)) / dd
    center = jnp.stack([ux, uy], axis=-1)
    r = jnp.linalg.norm(p0 - center, axis=-1)
    return center, r, ok


def ransac_circle(
    xy: Array, mask: Array, key: Array,
    max_iters: int = 400, threshold: float = 0.02,
    radius_range: tuple = (0.02, 0.5), min_inliers: int = 5,
) -> CircleFit:
    """3-point circle RANSAC with radius constraint, scored by inlier count
    then mean error (``circle_fit.cpp:8-101``)."""
    n = xy.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    ks = jax.random.split(key, 3)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(max_iters,), p=probs)
    )(jnp.stack(ks))
    c, r, valid_h = _circle_from_3pts(xy[idx[0]], xy[idx[1]], xy[idx[2]])
    valid_h &= (r >= radius_range[0]) & (r <= radius_range[1])

    d = jnp.abs(jnp.linalg.norm(xy[:, None, :] - c[None, :, :], axis=-1) - r[None, :])
    inl = (d < threshold) & mask[:, None]                   # (N, H)
    counts = jnp.sum(inl, axis=0)
    err = jnp.sum(jnp.where(inl, d, 0.0), axis=0) / jnp.maximum(counts, 1)
    # primary: count; tiebreak: lower mean error
    score = counts.astype(jnp.float32) - err
    score = jnp.where(valid_h, score, -jnp.inf)
    best = jnp.argmax(score)
    return CircleFit(c[best], r[best], counts[best], err[best],
                     (counts[best] >= min_inliers) & valid_h[best])


def fit_circle_algebraic(xy: Array, mask: Array) -> CircleFit:
    """Least-squares (Kasa) circle fit: solve [2x 2y 1] p = x^2+y^2
    (``target_detector.cpp:538-603``).

    Points are centered on their centroid before the solve: the raw normal
    equations are catastrophically ill-conditioned in float32 for a small
    circle far from the origin (the constant column is nearly collinear with
    x and y), which produced wrong fits on TPU."""
    w = mask.astype(xy.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(xy * w[:, None], axis=0) / wsum
    q = xy - mu
    M = jnp.stack([2 * q[:, 0], 2 * q[:, 1], jnp.ones_like(q[:, 0])], axis=1) * w[:, None]
    b = (q[:, 0] ** 2 + q[:, 1] ** 2) * w
    MtM = M.T @ M + 1e-9 * jnp.eye(3)
    p = jnp.linalg.solve(MtM, M.T @ b)
    center = p[:2] + mu
    r2 = p[2] + jnp.sum(p[:2] * p[:2])
    radius = jnp.sqrt(jnp.maximum(r2, 0.0))
    d = jnp.abs(jnp.linalg.norm(xy - center, axis=1) - radius)
    cnt = jnp.sum(mask)
    err = jnp.sum(d * w) / jnp.maximum(cnt, 1)
    return CircleFit(center, radius, cnt, err, cnt >= 3)


# ---------------------------------------------------------------------------
# statistical outlier removal
# ---------------------------------------------------------------------------


def statistical_outlier_mask(xyz: Array, mask: Array, k: int = 10,
                             std_mul: float = 1.0,
                             cell_size: float = 1.0,
                             table_size: int = 8192,
                             candidates_per_cell: int = 32) -> Array:
    """pcl::StatisticalOutlierRemoval semantics: drop points whose mean k-NN
    distance exceeds global_mean + std_mul * global_std."""
    grid = knn.build(xyz, mask, cell_size, table_size)
    res = knn.query(grid, xyz, mask, k=k + 1, candidates_per_cell=candidates_per_cell)
    # skip self (distance 0, first)
    d = jnp.sqrt(jnp.maximum(res.sqdist[:, 1:], 0.0))
    valid = res.valid[:, 1:]
    has_nbr = valid.sum(axis=1) > 0
    mean_d = jnp.sum(jnp.where(valid, d, 0.0), axis=1) / jnp.maximum(valid.sum(axis=1), 1)
    # no neighbor within the grid scope (one cell_size) -> isolated -> outlier
    mean_d = jnp.where(has_nbr, mean_d, jnp.inf)
    wm = mask & has_nbr
    mu = jnp.sum(jnp.where(wm, mean_d, 0.0)) / jnp.maximum(jnp.sum(wm), 1)
    var = jnp.sum(jnp.where(wm, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(jnp.sum(wm), 1)
    thr = mu + std_mul * jnp.sqrt(var)
    return mask & (mean_d <= thr)
