"""Batched registration solvers: LOAM scan-to-map Gauss-Newton, ICP, GICP, NDT.

TPU rebuild of the reference's registration stack:

* :func:`scan_to_map` — the LIO-SAM scan-to-map optimizer
  (``mapOptmization.cpp:974-1310``): per-iteration 5-NN correspondence in
  corner/surface map hash grids, point-to-line coeffs via 3x3 covariance
  eigendecomposition (``cornerOptimization`` :974-1064), point-to-plane
  coeffs via LSQ plane fit with validity gates (``surfOptimization``
  :1066-1135), 6-dof Gauss-Newton on the (roll,pitch,yaw,x,y,z)
  parameterization with eigenvalue degeneracy projection
  (``LMOptimization`` :1158-1280, threshold 100) and the reference's
  convergence gates (deltaR < 0.05 deg, deltaT < 0.05 cm).
* :func:`icp_point2point` — pcl::IterativeClosestPoint equivalent for loop
  closure (``performLoopClosure`` :559-573) and manual calibration.
* :func:`gicp` — covariance-weighted (plane-to-plane) ICP, the Open3D GICP
  role in Multi_LiCa (``Calibration.py:292-345``).
* :func:`ndt` — normal-distributions transform against a voxel-Gaussian map,
  the pcl::NDT role in the online calibrator
  (``multi_lidar_calibrator.cpp:28-63``).  Implemented as Gauss-Newton on the
  point-to-distribution Mahalanobis cost (not PCL's More-Thuente line search;
  convergence behavior documented in tests).

All solvers run a fixed iteration count inside ``lax.while_loop`` with
convergence-frozen state, fully on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn, linalg, se3, segments

Array = jax.Array

# Residual weight of surf cells RECLASSIFIED as arc-lines (see
# voxelmap.build(plane_min_spread)): the measured trade on the two extreme
# workloads (r5) — weight 1.0 minimizes blind-corridor drift (0.62 m
# dumbbell final) but the radial pull toward stale map-ring radii pushes
# the bench room drive past its 0.10 m gate (0.39 m); 0.35 keeps the bench
# green (0.077 m) at 2.2 m dumbbell loop-off, which loop closure then
# recovers.  0.5 measured 0.12 m on the bench (red).
ARC_LINE_WEIGHT = 0.35


# ---------------------------------------------------------------------------
# Euler-parameterized rotation derivatives (lidar-frame rpy)
# ---------------------------------------------------------------------------


def _rot_and_derivs(rpy: Array) -> tuple[Array, Array, Array, Array]:
    """R = Rz Ry Rx and dR/droll, dR/dpitch, dR/dyaw (each 3x3).

    Mathematically identical to the camera-permuted analytic Jacobian of
    ``LMOptimization`` (the cyclic axis permutation there conjugates the same
    parameterization)."""
    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    Rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    dRx = jnp.array([[0, 0, 0], [0, -sr, -cr], [0, cr, -sr]])
    dRy = jnp.array([[-sp, 0, cp], [0, 0, 0], [-cp, 0, -sp]])
    dRz = jnp.array([[-sy, -cy, 0], [cy, -sy, 0], [0, 0, 0]])
    R = Rz @ Ry @ Rx
    return R, Rz @ Ry @ dRx, Rz @ dRy @ Rx, dRz @ Ry @ Rx


# ---------------------------------------------------------------------------
# Scan-to-map (LOAM) Gauss-Newton
# ---------------------------------------------------------------------------


class ScanToMapResult(NamedTuple):
    pose: Array        # (6,) roll,pitch,yaw,x,y,z
    degenerate: Array  # () bool
    converged: Array   # () bool
    iterations: Array  # () int32
    n_corner: Array    # () int32 inlier corners at last iteration
    n_surf: Array      # () int32 inlier surfs


def _query5(grid, p_world, p_mask, candidates_per_cell, use_pallas):
    """5-NN via the XLA hash grid, or the VMEM-resident Pallas kernel on TPU
    (the use_pallas switch; every pcl::KdTreeFLANN site,
    mapOptmization.cpp:993,1089)."""
    if use_pallas:
        from .knn_pallas import query_pallas

        return query_pallas(grid, p_world, p_mask, k=5,
                            candidates_per_cell=candidates_per_cell,
                            interpret=jax.default_backend() != "tpu")
    return knn.query(grid, p_world, p_mask, k=5,
                     candidates_per_cell=candidates_per_cell)


def _corner_coeffs(
    p_world: Array, p_mask: Array, grid: knn.HashGrid, map_xyz: Array,
    candidates_per_cell: int, use_pallas: bool = False,
) -> tuple[Array, Array, Array]:
    """Point-to-line residuals: (n (N,3), d (N,), weight-gated mask (N,)).

    Mirrors ``cornerOptimization``: 5-NN gated at sqdist < 1, line from the
    largest eigenvector of the neighbor covariance if lam_max > 3*lam_mid,
    distance weighting s = 1 - 0.9|d|, keep s > 0.1."""
    res = _query5(grid, p_world, p_mask, candidates_per_cell, use_pallas)
    ok = p_mask & jnp.all(res.valid, axis=1) & (res.sqdist[:, 4] < 1.0)
    nbrs = map_xyz[res.idx]                      # (N, 5, 3)
    c = jnp.mean(nbrs, axis=1)                   # (N, 3)
    dev = nbrs - c[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", dev, dev) / 5.0
    vals, vecs = linalg.sym3x3_eigh(cov)
    line_ok = vals[:, 2] > 3.0 * vals[:, 1]
    v = vecs[:, 2, :]                            # (N, 3) line direction
    # point-to-line distance and gradient
    delta = p_world - c
    along = jnp.sum(delta * v, axis=1, keepdims=True)
    perp = delta - along * v
    d = jnp.linalg.norm(perp, axis=1)
    n = perp / jnp.maximum(d, 1e-9)[:, None]     # unit gradient of d wrt point
    s = 1.0 - 0.9 * jnp.abs(d)
    keep = ok & line_ok & (s > 0.1)
    return n * s[:, None], s * d, keep


def _surf_coeffs(
    p_world: Array, p_scan: Array, p_mask: Array, grid: knn.HashGrid,
    map_xyz: Array, candidates_per_cell: int, use_pallas: bool = False,
) -> tuple[Array, Array, Array]:
    """Point-to-plane residuals, mirroring ``surfOptimization``: plane through
    the 5 neighbors, validity |n.x + d| <= 0.2 for all 5,
    s = 1 - 0.9|pd|/sqrt(sqrt(|p_scan|)).

    Deviation: the reference fits the plane algebraically (A n = -1, QR),
    which is singular for planes passing through the origin; we use the
    total-least-squares fit (centroid + smallest covariance eigenvector),
    which is equivalent for well-conditioned planes and strictly more robust.
    """
    res = _query5(grid, p_world, p_mask, candidates_per_cell, use_pallas)
    ok = p_mask & jnp.all(res.valid, axis=1) & (res.sqdist[:, 4] < 1.0)
    nbrs = map_xyz[res.idx]                      # (N, 5, 3)
    c = jnp.mean(nbrs, axis=1)
    dev = nbrs - c[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", dev, dev)
    _, vecs = linalg.sym3x3_eigh(cov)
    n = vecs[:, 0, :]                            # smallest-eigenvector normal
    d0 = -jnp.sum(n * c, axis=1)
    fit_err = jnp.abs(jnp.einsum("nki,ni->nk", nbrs, n) + d0[:, None])
    plane_ok = jnp.all(fit_err <= 0.2, axis=1)
    pd = jnp.sum(p_world * n, axis=1) + d0
    rng = jnp.linalg.norm(p_scan, axis=1)
    s = 1.0 - 0.9 * jnp.abs(pd) / jnp.sqrt(jnp.sqrt(jnp.maximum(rng, 1e-6)))
    keep = ok & plane_ok & (s > 0.1)
    return n * s[:, None], s * pd, keep


def scan_to_map(
    corner_scan: Array, corner_mask: Array,
    surf_scan: Array, surf_mask: Array,
    corner_grid: knn.HashGrid, corner_map_xyz: Array,
    surf_grid: knn.HashGrid, surf_map_xyz: Array,
    init_pose: Array,
    max_iters: int = 30,
    eig_threshold: float = 100.0,
    min_points: int = 50,
    candidates_per_cell: int = 24,
    use_pallas: bool = False,
) -> ScanToMapResult:
    """Fused LOAM scan-to-map Gauss-Newton (``scan2MapOptimization`` +
    ``LMOptimization``).  pose = (roll, pitch, yaw, x, y, z)."""

    def coeffs_and_step(pose, P, degenerate, it):
        R, dRr, dRp, dRy = _rot_and_derivs(pose[:3])
        t = pose[3:]
        cw = corner_scan @ R.T + t
        sw = surf_scan @ R.T + t
        cn, cd, cm = _corner_coeffs(cw, corner_mask, corner_grid,
                                    corner_map_xyz, candidates_per_cell,
                                    use_pallas)
        sn, sd, sm = _surf_coeffs(sw, surf_scan, surf_mask, surf_grid,
                                  surf_map_xyz, candidates_per_cell,
                                  use_pallas)

        def jac(n, pts, m):
            jr = jnp.stack(
                [
                    jnp.sum(n * (pts @ dRr.T), axis=1),
                    jnp.sum(n * (pts @ dRp.T), axis=1),
                    jnp.sum(n * (pts @ dRy.T), axis=1),
                ],
                axis=1,
            )
            J = jnp.concatenate([jr, n], axis=1)  # (N, 6)
            return J * m[:, None].astype(J.dtype)

        Jc = jac(cn, corner_scan, cm)
        Js = jac(sn, surf_scan, sm)
        rc = cd * cm
        rs = sd * sm
        H = Jc.T @ Jc + Js.T @ Js
        g = Jc.T @ rc + Js.T @ rs
        n_sel = jnp.sum(cm) + jnp.sum(sm)
        dx = -linalg.solve_psd(H, g, damping=1e-6)

        # Degeneracy analysis on the first iteration (LMOptimization :1232-1252)
        def first_iter_P():
            vals, vecs = jnp.linalg.eigh(H)  # ascending, vecs in columns
            good = (vals >= eig_threshold).astype(H.dtype)
            Pm = (vecs * good[None, :]) @ vecs.T
            return Pm, jnp.any(vals < eig_threshold)

        P, degenerate = jax.lax.cond(
            it == 0, first_iter_P, lambda: (P, degenerate)
        )
        dx = P @ dx
        enough = n_sel >= min_points
        dx = jnp.where(enough, dx, 0.0)

        delta_r = jnp.sqrt(jnp.sum(jnp.degrees(dx[:3]) ** 2))
        delta_t = jnp.sqrt(jnp.sum((dx[3:] * 100.0) ** 2))
        converged = (delta_r < 0.05) & (delta_t < 0.05)
        return pose + dx, P, degenerate, converged | ~enough, jnp.sum(cm), jnp.sum(sm)

    def cond(state):
        _, _, _, done, it, _, _ = state
        return (~done) & (it < max_iters)

    def body(state):
        pose, P, degenerate, done, it, nc, ns = state
        pose, P, degenerate, conv, nc, ns = coeffs_and_step(pose, P, degenerate, it)
        return pose, P, degenerate, conv, it + 1, nc, ns

    P0 = jnp.eye(6, dtype=init_pose.dtype)
    state = (init_pose, P0, jnp.asarray(False), jnp.asarray(False),
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    pose, P, degenerate, done, it, nc, ns = jax.lax.while_loop(cond, body, state)
    return ScanToMapResult(pose, degenerate, done, it, nc, ns)


# ---------------------------------------------------------------------------
# Scan-to-map against voxel feature maps (VoxelMap-style; see ops/voxelmap.py)
# ---------------------------------------------------------------------------


def scan_to_map_voxel(
    corner_scan: Array, corner_mask: Array,
    surf_scan: Array, surf_mask: Array,
    corner_vmap, surf_vmap,
    init_pose: Array,
    max_iters: int = 30,
    eig_threshold: float = 100.0,
    min_points: int = 50,
    use_pallas: bool = False,
    plateau_rtol: float = 1e-3,
    plateau_min_iters: int = 2,
    reassoc_rot: float = 0.0,
    reassoc_trans: float = 0.0,
) -> ScanToMapResult:
    """Same contract as :func:`scan_to_map`, but correspondences come from
    precomputed per-voxel line/plane features (one structured lookup per
    iteration instead of 5-NN gathers) — the TPU-native hot path.  Residual
    definitions, s-weighting, degeneracy projection and convergence gates
    match the kNN variant.  use_pallas routes the lookup through the
    VMEM-resident Pallas kernel (voxelmap_pallas).

    reassoc_rot/reassoc_trans > 0 enable frozen-correspondence iterations:
    the voxel lookup (the dominant per-iteration cost on TPU) only re-runs
    when the pose has moved more than the thresholds (max-abs rad / m) since
    the last lookup; in between, iterations reuse the matched voxels' stats
    and recompute residuals under the updated pose.  A point's association
    only changes when the update moves it across a cell boundary, so
    sub-threshold updates see identical correspondences almost surely.
    0.0/0.0 = re-associate every iteration (the reference's semantics,
    ``mapOptmization.cpp:1292-1310``)."""
    from . import voxelmap

    # one fused query set: rows [0, Qc) are corners (point-to-line residual
    # against the corner map), the rest surfaces (point-to-plane against the
    # surf map).  The GN loop is sequential per window slot, so halving the
    # op count (one lookup/residual/jacobian/matmul chain instead of two)
    # is wall-clock directly.
    Qc = corner_scan.shape[0]
    pts = jnp.concatenate([corner_scan, surf_scan], axis=0)
    pmask = jnp.concatenate([corner_mask, surf_mask], axis=0)
    is_c = jnp.arange(pts.shape[0]) < Qc
    rng_q = jnp.linalg.norm(pts, axis=1)

    if use_pallas:
        from .voxelmap_pallas import lookup_pallas, prepare_tables

        # kernel-ready layouts computed once, outside the GN loop
        _tables = {"c": prepare_tables(corner_vmap),
                   "s": prepare_tables(surf_vmap)}

        def _lookup(w):
            ch = lookup_pallas(_tables["c"], w[:Qc], pmask[:Qc])
            sh = lookup_pallas(_tables["s"], w[Qc:], pmask[Qc:])
            return jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), ch, sh)
    else:
        def _lookup(w):
            return voxelmap.lookup_cat(corner_vmap, surf_vmap, w, pmask, Qc)

    freeze = reassoc_rot > 0.0 or reassoc_trans > 0.0

    def step(pose, P, degenerate, it, assoc, pose_ref):
        R, dRr, dRp, dRy = _rot_and_derivs(pose[:3])
        t = pose[3:]
        w = pts @ R.T + t

        if freeze:
            need = ((it == 0)
                    | (jnp.max(jnp.abs(pose[:3] - pose_ref[:3])) > reassoc_rot)
                    | (jnp.max(jnp.abs(pose[3:] - pose_ref[3:]))
                       > reassoc_trans))
            hit, pose_ref = jax.lax.cond(
                need, lambda: (_lookup(w), pose), lambda: (assoc, pose_ref))
        else:
            hit = _lookup(w)
        assoc = hit

        # corner rows: point-to-line (line_residuals); surf rows: signed
        # point-to-plane (plane_residuals) — same math, computed on the
        # fused winner stats and selected per class.  Surf cells the fit
        # RECLASSIFIED as lines (thin single-ring arcs; their direction
        # ships scaled by voxelmap.LINE_DIR_SCALE) also take the line
        # residual: the arc constrains height + cross-arc exactly, and
        # neither a noisy normal (pitch torque) nor a blank (z starvation)
        # — see voxelmap.build(plane_min_spread).
        from .voxelmap import LINE_DIR_GATE

        dnorm = jnp.linalg.norm(hit.direction, axis=1)
        hit_is_line = dnorm < LINE_DIR_GATE
        v = hit.direction / jnp.maximum(dnorm, 1e-9)[:, None]
        use_line = is_c | hit_is_line
        delta = w - hit.mean
        along = jnp.sum(delta * v, axis=1, keepdims=True)
        perp = delta - along * v
        rl = jnp.linalg.norm(perp, axis=1)
        gradl = perp / jnp.maximum(rl, 1e-9)[:, None]
        rp = jnp.sum(w * v, axis=1) + hit.d
        r = jnp.where(use_line, rl, rp)
        n = jnp.where(use_line[:, None], gradl, v)

        s = jnp.where(
            is_c, 1.0 - 0.9 * jnp.abs(r),
            1.0 - 0.9 * jnp.abs(r)
            / jnp.sqrt(jnp.sqrt(jnp.maximum(rng_q, 1e-6))))
        m = pmask & hit.found & (s > 0.1)
        # reclassified arc cells carry real but weaker information: their
        # cross-arc component pulls toward the MAP's ring radius, which
        # lags the scan's ring geometry as the robot moves (a radial bias
        # planes do not have — plane residuals act along the near-vertical
        # normal only).  Down-weighting (after the selection gate) keeps
        # the z support that blanking starved while bounding the radial
        # pull (measured r5 on the bench room drive).
        s = jnp.where(hit_is_line & ~is_c, ARC_LINE_WEIGHT * s, s)
        nw = n * s[:, None]
        d = s * r

        jr = jnp.stack([
            jnp.sum(nw * (pts @ dRr.T), axis=1),
            jnp.sum(nw * (pts @ dRp.T), axis=1),
            jnp.sum(nw * (pts @ dRy.T), axis=1),
        ], axis=1)
        J = jnp.concatenate([jr, nw], axis=1) * m[:, None].astype(pts.dtype)
        rr = d * m
        H = J.T @ J
        g = J.T @ rr
        n_sel = jnp.sum(m)
        cost = (rr @ rr) / jnp.maximum(n_sel, 1)
        cm = m & is_c
        sm = m & ~is_c
        dx = -linalg.solve_psd(H, g, damping=1e-6)

        def first_iter_P():
            vals, vecs = jnp.linalg.eigh(H)
            good = (vals >= eig_threshold).astype(H.dtype)
            return (vecs * good[None, :]) @ vecs.T, jnp.any(vals < eig_threshold)

        P, degenerate = jax.lax.cond(it == 0, first_iter_P,
                                     lambda: (P, degenerate))
        dx = P @ dx
        enough = n_sel >= min_points
        dx = jnp.where(enough, dx, 0.0)
        delta_r = jnp.sqrt(jnp.sum(jnp.degrees(dx[:3]) ** 2))
        delta_t = jnp.sqrt(jnp.sum((dx[3:] * 100.0) ** 2))
        converged = (delta_r < 0.05) & (delta_t < 0.05)
        return (pose + dx, P, degenerate, converged | ~enough, cost,
                jnp.sum(cm), jnp.sum(sm), assoc, pose_ref)

    def cond(state):
        _, _, _, done, it, _, _, _, _, _ = state
        return (~done) & (it < max_iters)

    def body(state):
        pose, P, degenerate, done, it, prev_cost, nc, ns, assoc, pref = state
        (pose, P, degenerate, conv, cost, nc, ns, assoc,
         pref) = step(pose, P, degenerate, it, assoc, pref)
        # voxel correspondences flip-flop below the mm scale: also stop when
        # the mean squared residual stops improving (plateau detection; the
        # reference's exact-NN geometry converges without this)
        plateau = (it >= plateau_min_iters) & (
            prev_cost - cost < plateau_rtol * cost)
        return pose, P, degenerate, conv | plateau, it + 1, cost, nc, ns, \
            assoc, pref

    # carry seeds derive from the inputs (a numeric no-op) so shard_map's
    # varying-manual-axes check passes when the clouds are device-varying
    # (multisession rendezvous runs this per session) — same trick as
    # _icp_run
    zero = jnp.sum(pmask).astype(init_pose.dtype) * 0.0
    izero = jnp.sum(pmask).astype(jnp.int32) * 0
    bzero = izero > 0  # varying False

    def _empty_hit(n):
        return voxelmap.VoxelLookup(
            idx=jnp.zeros((n,), jnp.int32) + izero,
            found=jnp.zeros((n,), bool) | bzero,
            mean=jnp.zeros((n, 3), init_pose.dtype) + zero,
            direction=jnp.zeros((n, 3), init_pose.dtype) + zero,
            d=jnp.zeros((n,), init_pose.dtype) + zero,
        )

    P0 = jnp.eye(6, dtype=init_pose.dtype) + zero
    assoc0 = _empty_hit(pts.shape[0])
    state = (init_pose + zero, P0, bzero, bzero,
             jnp.asarray(0, jnp.int32) + izero,
             jnp.asarray(jnp.inf) + zero,
             jnp.asarray(0, jnp.int32) + izero,
             jnp.asarray(0, jnp.int32) + izero,
             assoc0, init_pose + zero)
    pose, P, degenerate, done, it, cost, nc, ns, _, _ = jax.lax.while_loop(
        cond, body, state)
    return ScanToMapResult(pose, degenerate, done, it, nc, ns)


# ---------------------------------------------------------------------------
# Point-to-point ICP (loop closure / manual calibration)
# ---------------------------------------------------------------------------


class IcpResult(NamedTuple):
    pose: se3.Pose     # source -> target
    fitness: Array     # mean sq distance of matched points (PCL getFitnessScore)
    matched_frac: Array
    converged: Array
    iters: Array = jnp.asarray(0, jnp.int32)  # iterations actually run


def icp_point2point(
    src_xyz: Array, src_mask: Array,
    tgt_grid: knn.HashGrid, tgt_xyz: Array,
    init_pose: se3.Pose,
    max_iters: int = 100,
    max_corr_dist: float = 2.0,
    fitness_max_dist: float = jnp.inf,
    transformation_eps: float = 1e-6,
    candidates_per_cell: int = 16,
    rel_mse_eps: float = 1e-5,
    abs_mse_eps: float = 1e-12,
) -> IcpResult:
    """SVD-based rigid ICP (pcl::IterativeClosestPoint semantics: per-iter NN
    correspondences within ``max_corr_dist``, Umeyama/Kabsch update, stop on
    PCL's DefaultConvergenceCriteria; fitness = mean squared NN distance).

    Stopping rule (pcl DefaultConvergenceCriteria, the criteria object
    ``IterativeClosestPoint`` wires its epsilons into): iteration cap, OR
    transform similarity — update translation^2 < ``transformation_eps``
    AND update rotation cos(angle) > 1 - ``transformation_eps`` (PCL's
    setTranslationThreshold / setRotationThreshold(1 - eps) mapping of
    ``setTransformationEpsilon``), OR correspondence MSE absolute
    (< ``abs_mse_eps``) / relative (|prev-cur| < ``rel_mse_eps``·prev, PCL's
    ``setRelativeMSE`` mapping of ``setEuclideanFitnessEpsilon``).  The MSE
    criteria matter on TPU: default-precision matmul jitter in the Kabsch
    update keeps per-iteration increments above tiny transform epsilons, so
    without them every loop-closure ICP burned the full iteration cap
    (~100x the useful work; round-3 loop-ON bench measured the cost).

    ``converged`` follows PCL's ``hasConverged()``: reaching the iteration
    cap is a VALID stop (DefaultConvergenceCriteria reports
    CONVERGENCE_CRITERIA_ITERATIONS as converged), so the flag only demands
    that correspondences existed — the caller's gate is the fitness score,
    exactly like ``performLoopClosure``'s
    ``icp.hasConverged() == false || icp.getFitnessScore() > ...``
    (mapOptmization.cpp:575-580)."""

    def nn1(moved, max_sq):
        return knn.query(tgt_grid, moved, src_mask, k=1,
                         candidates_per_cell=candidates_per_cell,
                         max_sqdist=max_sq)

    return _icp_run(src_xyz, src_mask, nn1, tgt_xyz, init_pose, max_iters,
                    max_corr_dist, fitness_max_dist, transformation_eps,
                    rel_mse_eps, abs_mse_eps)


def icp_point2point_brute(
    src_xyz: Array, src_mask: Array,
    tgt_xyz: Array, tgt_mask: Array,
    init_pose: se3.Pose,
    max_iters: int = 100,
    max_corr_dist: float = 2.0,
    fitness_max_dist: float = jnp.inf,
    transformation_eps: float = 1e-6,
    rel_mse_eps: float = 1e-5,
    abs_mse_eps: float = 1e-12,
    chunk: int = 8192,
) -> IcpResult:
    """:func:`icp_point2point` with the correspondence search done by an
    exact chunked dense sweep (:func:`knn.nearest1_brute`) instead of the
    hash grid — the TPU-shaped choice for loop-closure sizes, where the
    27-cell gather path costs ~100x more per iteration (see nearest1_brute).
    No grid build, exact NN, same PCL convergence semantics."""

    def nn1(moved, max_sq):
        res = knn.nearest1_brute(tgt_xyz, tgt_mask, moved, src_mask,
                                 chunk=chunk)
        return res._replace(valid=res.valid & (res.sqdist <= max_sq))

    return _icp_run(src_xyz, src_mask, nn1, tgt_xyz, init_pose, max_iters,
                    max_corr_dist, fitness_max_dist, transformation_eps,
                    rel_mse_eps, abs_mse_eps)


def icp_curvature_brute(
    src_xyz: Array, src_mask: Array,
    tgt_xyz: Array, tgt_mask: Array,
    pose: se3.Pose,
    max_corr_dist: float = 2.0,
    delta_t: float = 1.5,
    delta_r: float = 0.1,
    chunk: int = 8192,
) -> tuple[Array, Array]:
    """Per-axis curvature of the ICP cost around a converged `pose`:
    ``(kappa, c0)`` with kappa (6,) = [rot x,y,z, trans x,y,z] central
    second differences of the mean-squared-NN-distance cost, each probe
    RE-ASSOCIATING correspondences (that is the point: an x-degenerate
    corridor match slides along x with near-zero re-associated cost change,
    which a fixed-correspondence Hessian cannot see — point-to-point
    translation blocks are isotropic by construction).

    Fitness alone accepts such matches (the reference gates loops ONLY on
    fitness, ``performLoopClosure`` mapOptmization.cpp:575-580), and a loop
    factor whose x is arbitrary corrupts the graph precisely on the drives
    loop closure exists for.  13 brute NN sweeps (~13 ICP iterations'
    cost) at loop rate buy the anisotropic gate.

    Rotation probes are conjugated about the MOVED CLOUD's centroid
    (``x' = R_dq (x - c) + c``), not the world origin: a left-multiplied dq
    on a cloud at distance ``|c|`` from the origin sweeps every point by
    ``~delta_r * |c|``, so the probe would measure POSITION, not rotation
    observability — at KITTI scale the lever arm destroys every
    correspondence and all rotation axes read as position-dependent garbage
    (ADVICE r4 high).  Conjugation makes kappa translation-invariant: the
    probe couples only to the cloud's own extent.

    A probe that destroys ALL correspondences returns the saturated cost
    ``max_corr_dist**2`` (the per-pair ceiling) instead of 0 — losing every
    match under a perturbation is maximal sensitivity, not perfect
    unobservability (ADVICE r4 medium)."""

    def cost(p):
        moved = p.apply(src_xyz)
        res = knn.nearest1_brute(tgt_xyz, tgt_mask, moved, src_mask,
                                 chunk=chunk)
        ok = res.valid[:, 0] & src_mask & (
            res.sqdist[:, 0] <= max_corr_dist * max_corr_dist)
        n_ok = jnp.sum(ok)
        mean = jnp.sum(jnp.where(ok, res.sqdist[:, 0], 0.0)) / jnp.maximum(
            n_ok, 1)
        return jnp.where(n_ok == 0, max_corr_dist * max_corr_dist, mean)

    c0 = cost(pose)
    w = src_mask.astype(src_xyz.dtype)
    center = (jnp.sum(pose.apply(src_xyz) * w[:, None], axis=0)
              / jnp.maximum(jnp.sum(w), 1.0))

    def axis_kappa(i):
        rot = i < 3
        d = jnp.where(rot, delta_r, delta_t)
        e = jnp.zeros(3).at[i % 3].set(d)

        def perturb(sign):
            dq = se3.so3_exp_quat(jnp.where(rot, sign * e, jnp.zeros(3)))
            dt = jnp.where(rot, jnp.zeros(3), sign * e)
            # rotation conjugated about `center`: applied to a point x this
            # is R_dq (pose(x) - center) + center; translations are plain
            return se3.Pose(
                se3.quat_mul(dq, pose.q),
                se3.quat_rotate(dq, pose.t - jnp.where(rot, center, 0.0))
                + jnp.where(rot, center, 0.0) + dt)

        cp, cm = cost(perturb(1.0)), cost(perturb(-1.0))
        return (cp + cm - 2.0 * c0) / (d * d)

    # sequential map keeps one NN sweep's memory footprint at a time
    kappa = jax.lax.map(axis_kappa, jnp.arange(6))
    return kappa, c0


def _icp_run(src_xyz, src_mask, nn1, tgt_xyz, init_pose, max_iters,
             max_corr_dist, fitness_max_dist, transformation_eps,
             rel_mse_eps, abs_mse_eps) -> IcpResult:
    def body(state):
        pose, _, _, _, prev_mse, it, _ = state
        moved = pose.apply(src_xyz)
        res = nn1(moved, max_corr_dist * max_corr_dist)
        ok = res.valid[:, 0] & src_mask
        w = ok.astype(src_xyz.dtype)
        nm = jnp.maximum(jnp.sum(w), 1.0)
        mse = jnp.sum(jnp.where(ok, res.sqdist[:, 0], 0.0)) / nm
        dst = tgt_xyz[res.idx[:, 0]]
        R, t = linalg.weighted_kabsch(moved, dst, w)
        inc = se3.Pose(se3.matrix_to_quat(R), t)
        new_pose = inc.compose(pose)
        # update magnitude, PCL-style: translation^2 and rotation cos(angle)
        trans_sqr = jnp.sum(t * t)
        cos_ang = 0.5 * (jnp.trace(R) - 1.0)
        return new_pose, trans_sqr, cos_ang, prev_mse, mse, it + 1, w.sum()

    def cond(state):
        _, trans_sqr, cos_ang, prev_mse, mse, it, nmatch = state
        similar = (trans_sqr < transformation_eps) & (
            cos_ang > 1.0 - transformation_eps)
        mse_stop = (mse < abs_mse_eps) | (
            jnp.abs(prev_mse - mse) < rel_mse_eps * prev_mse)
        stop = similar | mse_stop | (nmatch <= 0)
        return (it == 0) | ((it < max_iters) & ~stop)

    # carry seeds derive from the inputs (a numeric no-op) so shard_map's
    # varying-manual-axes check passes when the clouds are device-varying
    # (parallel/multisession.cross_session_align runs this per session)
    zero = jnp.sum(src_mask).astype(src_xyz.dtype) * 0.0
    inf = jnp.asarray(jnp.inf, src_xyz.dtype) + zero
    state = (se3.Pose(init_pose.q + zero, init_pose.t + zero),
             inf, -inf, inf, inf,
             jnp.asarray(0, jnp.int32) + jnp.sum(src_mask) * 0,
             zero)
    pose, trans_sqr, cos_ang, prev_mse, mse, it, nmatch = jax.lax.while_loop(
        cond, body, state)

    moved = pose.apply(src_xyz)
    res = nn1(moved, min(fitness_max_dist**2, 1e18))
    ok = res.valid[:, 0] & src_mask
    nm = jnp.maximum(jnp.sum(ok), 1)
    fitness = jnp.sum(jnp.where(ok, res.sqdist[:, 0], 0.0)) / nm
    frac = nm / jnp.maximum(jnp.sum(src_mask), 1)
    return IcpResult(pose, fitness, frac, jnp.sum(ok) > 0, it)


# ---------------------------------------------------------------------------
# GICP (plane-to-plane, covariance-weighted)
# ---------------------------------------------------------------------------


def point_covariances(
    xyz: Array, mask: Array, grid: knn.HashGrid, k: int = 10,
    epsilon: float = 1e-3, candidates_per_cell: int = 24,
) -> Array:
    """GICP-regularized per-point covariances: eigenvalues of the k-NN scatter
    replaced by (1, 1, eps) (Segal et al.), as Open3D does for
    ``Calibration.py:292-345``'s GICP."""
    res = knn.query(grid, xyz, mask, k=k, candidates_per_cell=candidates_per_cell)
    # res.idx indexes the ORIGINAL array == xyz here
    nbrs = xyz[res.idx]                              # (N, k, 3)
    w = res.valid.astype(xyz.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu = jnp.sum(nbrs * w, axis=1) / cnt
    dev = (nbrs - mu[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", dev, dev) / cnt[..., None]
    vals, vecs = linalg.sym3x3_eigh(cov)
    new_vals = jnp.stack(
        [jnp.full(vals.shape[:-1], epsilon, xyz.dtype),
         jnp.ones(vals.shape[:-1], xyz.dtype),
         jnp.ones(vals.shape[:-1], xyz.dtype)], axis=-1
    )
    return jnp.einsum("nki,nk,nkj->nij", vecs, new_vals, vecs)


class GicpResult(NamedTuple):
    pose: se3.Pose
    fitness: Array
    matched_frac: Array
    converged: Array


def gicp(
    src_xyz: Array, src_mask: Array, src_cov: Array,
    tgt_grid: knn.HashGrid, tgt_xyz: Array, tgt_cov: Array,
    init_pose: se3.Pose,
    max_iters: int = 50,
    max_corr_dist: float = 1.0,
    transformation_eps: float = 1e-8,
    candidates_per_cell: int = 16,
) -> GicpResult:
    """Generalized ICP: Gauss-Newton on sum r^T (Cq + R Cp R^T)^-1 r with
    left-perturbation se(3) updates."""

    def body(state):
        pose, _, it = state
        R = se3.quat_to_matrix(pose.q)
        moved = pose.apply(src_xyz)
        res = knn.query(tgt_grid, moved, src_mask, k=1,
                        candidates_per_cell=candidates_per_cell,
                        max_sqdist=max_corr_dist * max_corr_dist)
        ok = res.valid[:, 0] & src_mask
        q = tgt_xyz[res.idx[:, 0]]
        Cq = tgt_cov[res.idx[:, 0]]
        M = linalg.inv3x3(Cq + R @ src_cov @ R.T)      # (N, 3, 3)
        r = moved - q                                   # (N, 3)
        # J: d(exp(w) moved + dt)/d(w,dt) at 0 = [-skew(moved) | I]
        Jr = -se3.skew(moved)
        w = ok.astype(src_xyz.dtype)
        # stack J = [Jr | I]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=src_xyz.dtype), Jr.shape)
        J = jnp.concatenate([Jr, eye], axis=2)          # (N, 3, 6)
        MJ = M @ J
        H = jnp.einsum("nik,nij,n->kj", J, MJ, w)
        g = jnp.einsum("nik,ni,n->k", MJ, r, w)
        dx = -linalg.solve_psd(H, g, damping=1e-6)
        dq = se3.so3_exp_quat(dx[:3])
        new_pose = se3.Pose(
            se3.quat_normalize(se3.quat_mul(dq, pose.q)),
            se3.quat_rotate(dq, pose.t) + dx[3:],
        )
        return new_pose, jnp.sum(dx * dx), it + 1

    def cond(state):
        _, delta, it = state
        return (delta > transformation_eps) & (it < max_iters)

    state = (init_pose, jnp.asarray(jnp.inf, src_xyz.dtype), jnp.asarray(0, jnp.int32))
    pose, delta, it = jax.lax.while_loop(cond, body, state)

    moved = pose.apply(src_xyz)
    res = knn.query(tgt_grid, moved, src_mask, k=1,
                    candidates_per_cell=candidates_per_cell,
                    max_sqdist=max_corr_dist * max_corr_dist)
    ok = res.valid[:, 0] & src_mask
    nm = jnp.maximum(jnp.sum(ok), 1)
    fitness = jnp.sum(ok) / jnp.maximum(jnp.sum(src_mask), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(ok, res.sqdist[:, 0], 0.0)) / nm)
    return GicpResult(pose, rmse, fitness, it < max_iters)


# ---------------------------------------------------------------------------
# NDT (point-to-distribution, voxel Gaussian map)
# ---------------------------------------------------------------------------


class NdtMap(NamedTuple):
    means: Array   # (V, 3)
    inv_cov: Array  # (V, 3, 3)
    mask: Array    # (V,)
    grid: knn.HashGrid  # over means, cell = resolution


def build_ndt_map(xyz: Array, mask: Array, resolution: float,
                  capacity: int, min_points: int = 5,
                  table_size: int = 8192) -> NdtMap:
    """Voxelize the target into per-cell Gaussians (mean + regularized
    covariance), like pcl::NormalDistributionsTransform's target grid."""
    from . import voxel as _voxel

    c = _voxel.voxel_coords(xyz, resolution)
    big = jnp.int32(2**30)
    cx = jnp.where(mask, c[:, 0], big)
    cy = jnp.where(mask, c[:, 1], big)
    cz = jnp.where(mask, c[:, 2], big)
    order = jnp.lexsort([cz, cy, cx])
    cs = jnp.stack([k[order] for k in (cz, cy, cx)], axis=1)
    valid_s = mask[order]
    xyz_s = xyz[order]
    new_voxel = jnp.any(cs != jnp.roll(cs, 1, axis=0), axis=1)
    new_voxel = new_voxel.at[0].set(True) & valid_s
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, capacity)
    # cell-center-demeaned sorted-segment moments (see ops/segments.py and
    # voxelmap.build: plain prefix scans beat scatters ~7x on v5e, and the
    # demeaning keeps f32 precision at metric magnitudes)
    w = valid_s.astype(xyz.dtype)
    bounds = segments.segment_boundaries(seg, capacity)
    cell_s = jnp.stack([cs[:, 2], cs[:, 1], cs[:, 0]], axis=1)  # (cx,cy,cz)
    center_s = (cell_s.astype(xyz.dtype) + 0.5) * resolution
    r_s = (xyz_s - center_s) * w[:, None]
    iu, ju = jnp.array([0, 0, 0, 1, 1, 2]), jnp.array([0, 1, 2, 1, 2, 2])
    outer6 = r_s[:, iu] * r_s[:, ju]
    moments = segments.sorted_segment_sum(
        jnp.concatenate([r_s, outer6, w[:, None]], axis=1), seg, capacity,
        boundaries=bounds, compensated=False)
    rsums, sq6, cnt = moments[:, :3], moments[:, 3:9], moments[:, 9]
    cell_v = segments.sorted_segment_first(cell_s, seg, capacity,
                                           boundaries=bounds)
    denom = jnp.maximum(cnt, 1.0)
    rmu = rsums / denom[:, None]
    mu = (cell_v.astype(xyz.dtype) + 0.5) * resolution + rmu
    sq = sq6[:, jnp.array([0, 1, 2, 1, 3, 4, 2, 4, 5])
             ].reshape(capacity, 3, 3)
    cov = sq / denom[:, None, None] - jnp.einsum("ni,nj->nij", rmu, rmu)
    # Sensor-noise floor BEFORE the eigen clamp: the demeaned moment math is
    # exact, so a cell of coplanar/coincident points yields lambda ~ 0 and a
    # ~1e6 inverse that dominates the NDT objective (the old raw-moment
    # cancellation noise used to hide this).  1% of the cell size models
    # ranging noise and bounds the peak inverse.
    noise = (0.01 * resolution) ** 2
    cov = cov + noise * jnp.eye(3, dtype=xyz.dtype)
    # Magnusson regularization: clamp small eigenvalues to 1e-2 * largest
    vals, vecs = linalg.sym3x3_eigh(cov)
    lam_max = jnp.maximum(vals[:, 2], 1e-6)
    vals = jnp.maximum(vals, 0.01 * lam_max[:, None])
    cov = jnp.einsum("nki,nk,nkj->nij", vecs, vals, vecs)
    ok = cnt >= min_points
    inv_cov = linalg.inv3x3(cov + 1e-6 * jnp.eye(3, dtype=xyz.dtype))
    grid = knn.build(mu, ok, cell_size=resolution, table_size=table_size)
    return NdtMap(mu, inv_cov, ok, grid)


class NdtResult(NamedTuple):
    pose: se3.Pose
    score: Array
    converged: Array


def ndt(
    src_xyz: Array, src_mask: Array,
    ndt_map: NdtMap,
    init_pose: se3.Pose,
    max_iters: int = 35,
    resolution: float = 1.0,
    transformation_eps: float = 1e-8,
    step_size: float = 1.0,
    candidates_per_cell: int = 8,
) -> NdtResult:
    """Gauss-Newton NDT: each source point is matched to the nearest voxel
    Gaussian (within one resolution) and pulled toward its mean under the
    voxel's inverse covariance."""

    def body(state):
        pose, _, it = state
        moved = pose.apply(src_xyz)
        res = knn.query(ndt_map.grid, moved, src_mask, k=1,
                        candidates_per_cell=candidates_per_cell,
                        max_sqdist=resolution * resolution * 2.25)
        ok = res.valid[:, 0] & src_mask & ndt_map.mask[res.idx[:, 0]]
        mu = ndt_map.means[res.idx[:, 0]]
        M = ndt_map.inv_cov[res.idx[:, 0]]
        r = moved - mu
        Jr = -se3.skew(moved)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=src_xyz.dtype), Jr.shape)
        J = jnp.concatenate([Jr, eye], axis=2)
        w = ok.astype(src_xyz.dtype)
        MJ = M @ J
        H = jnp.einsum("nik,nij,n->kj", J, MJ, w)
        g = jnp.einsum("nik,ni,n->k", MJ, r, w)
        dx = -step_size * linalg.solve_psd(H, g, damping=1e-4)
        dq = se3.so3_exp_quat(dx[:3])
        new_pose = se3.Pose(
            se3.quat_normalize(se3.quat_mul(dq, pose.q)),
            se3.quat_rotate(dq, pose.t) + dx[3:],
        )
        return new_pose, jnp.sum(dx * dx), it + 1

    def cond(state):
        _, delta, it = state
        return (delta > transformation_eps) & (it < max_iters)

    state = (init_pose, jnp.asarray(jnp.inf, src_xyz.dtype), jnp.asarray(0, jnp.int32))
    pose, delta, it = jax.lax.while_loop(cond, body, state)

    moved = pose.apply(src_xyz)
    res = knn.query(ndt_map.grid, moved, src_mask, k=1,
                    candidates_per_cell=candidates_per_cell,
                    max_sqdist=resolution * resolution * 2.25)
    ok = res.valid[:, 0] & src_mask
    mu = ndt_map.means[res.idx[:, 0]]
    M = ndt_map.inv_cov[res.idx[:, 0]]
    r = moved - mu
    mahal = jnp.einsum("ni,nij,nj->n", r, M, r)
    score = jnp.sum(jnp.where(ok, jnp.exp(-0.5 * mahal), 0.0)) / jnp.maximum(
        jnp.sum(src_mask), 1
    )
    return NdtResult(pose, score, it < max_iters)
