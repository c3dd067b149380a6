"""Fixed-sparsity batched pose-graph optimization.

Replaces the GTSAM iSAM2 backend of the reference
(``mapOptmization.cpp:1381-1581``: prior factor on the first keyframe,
between factors between consecutive keyframes, GPS factors gated by pose
covariance, loop-closure between factors; plus the incremental update with
extra passes after loops).  Instead of incremental Bayes-tree updates, the
whole graph is relinearized and solved by batched Gauss-Newton:

* residuals/Jacobians of ALL factors are computed in parallel (vmap +
  autodiff of the retraction — exact block Jacobians),
* the normal equations assemble by scatter-add into a dense (6K, 6K) system
  solved by Cholesky (fast on the MXU for K up to ~1k), or by block-Jacobi
  preconditioned conjugate gradients for larger graphs,
* a handful of GN iterations per update mirrors iSAM2's `update()` +
  extra passes after a loop (:1540-1548).

All shapes are static: the graph holds fixed-capacity factor tables with
masks, so one compiled program serves the whole session.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .se3 import Pose

Array = jax.Array


class PriorFactor(NamedTuple):
    idx: Array        # (P,) int32 pose index
    meas: Pose        # (P, ...) measured pose
    sqrt_info: Array  # (P, 6) diagonal sqrt information (1/sigma)
    mask: Array       # (P,)


class BetweenFactor(NamedTuple):
    i: Array          # (B,)
    j: Array          # (B,)
    meas: Pose        # relative pose i -> j
    sqrt_info: Array  # (B, 6)
    mask: Array       # (B,)


class GpsFactor(NamedTuple):
    idx: Array        # (G,)
    xyz: Array        # (G, 3)
    sqrt_info: Array  # (G, 3)
    mask: Array       # (G,)


class PoseGraph(NamedTuple):
    poses: Pose          # (K, ...)
    pose_mask: Array     # (K,)
    priors: PriorFactor
    betweens: BetweenFactor
    gps: GpsFactor

    @property
    def capacity(self) -> int:
        return self.poses.t.shape[0]


def empty_graph(max_poses: int, max_priors: int, max_betweens: int,
                max_gps: int) -> PoseGraph:
    def zpose(n):
        return Pose(se3.quat_identity((n,)), jnp.zeros((n, 3)))

    return PoseGraph(
        poses=zpose(max_poses),
        pose_mask=jnp.zeros(max_poses, bool),
        priors=PriorFactor(jnp.zeros(max_priors, jnp.int32), zpose(max_priors),
                           jnp.ones((max_priors, 6)), jnp.zeros(max_priors, bool)),
        betweens=BetweenFactor(jnp.zeros(max_betweens, jnp.int32),
                               jnp.zeros(max_betweens, jnp.int32), zpose(max_betweens),
                               jnp.ones((max_betweens, 6)), jnp.zeros(max_betweens, bool)),
        gps=GpsFactor(jnp.zeros(max_gps, jnp.int32), jnp.zeros((max_gps, 3)),
                      jnp.ones((max_gps, 3)), jnp.zeros(max_gps, bool)),
    )


# ---------------------------------------------------------------------------
# Residuals (gtsam-convention local coordinates) and Jacobians via autodiff
# ---------------------------------------------------------------------------


def _prior_residual(delta: Array, pose: Pose, meas: Pose) -> Array:
    """r = Log(meas^-1 * retract(pose, delta)) -> (6,) [rot, trans]."""
    p = se3.pose_retract(pose, delta)
    d = meas.between(p)
    return jnp.concatenate([se3.so3_log(d.q), d.t])


def _between_residual(di: Array, dj: Array, pi: Pose, pj: Pose, meas: Pose) -> Array:
    a = se3.pose_retract(pi, di)
    b = se3.pose_retract(pj, dj)
    d = meas.between(a.between(b))
    return jnp.concatenate([se3.so3_log(d.q), d.t])


def _gps_residual(delta: Array, pose: Pose, z: Array) -> Array:
    return se3.pose_retract(pose, delta).t - z


def _z6():
    return jnp.zeros(6)


@jax.jit
def _prior_terms(poses: Pose, f: PriorFactor):
    pi = jax.tree.map(lambda x: x[f.idx], poses)
    r = jax.vmap(_prior_residual, in_axes=(None, 0, 0))(_z6(), pi, f.meas)
    J = jax.vmap(jax.jacfwd(_prior_residual), in_axes=(None, 0, 0))(_z6(), pi, f.meas)
    w = f.mask.astype(r.dtype)[:, None] * f.sqrt_info
    return r * w, J * w[:, :, None]


@jax.jit
def _between_terms(poses: Pose, f: BetweenFactor):
    pi = jax.tree.map(lambda x: x[f.i], poses)
    pj = jax.tree.map(lambda x: x[f.j], poses)
    r = jax.vmap(_between_residual, in_axes=(None, None, 0, 0, 0))(_z6(), _z6(), pi, pj, f.meas)
    Ji = jax.vmap(jax.jacfwd(_between_residual, argnums=0), in_axes=(None, None, 0, 0, 0))(
        _z6(), _z6(), pi, pj, f.meas)
    Jj = jax.vmap(jax.jacfwd(_between_residual, argnums=1), in_axes=(None, None, 0, 0, 0))(
        _z6(), _z6(), pi, pj, f.meas)
    w = f.mask.astype(r.dtype)[:, None] * f.sqrt_info
    return r * w, Ji * w[:, :, None], Jj * w[:, :, None]


@jax.jit
def _gps_terms(poses: Pose, f: GpsFactor):
    pi = jax.tree.map(lambda x: x[f.idx], poses)
    r = jax.vmap(_gps_residual, in_axes=(None, 0, 0))(_z6(), pi, f.xyz)
    J = jax.vmap(jax.jacfwd(_gps_residual), in_axes=(None, 0, 0))(_z6(), pi, f.xyz)
    w = f.mask.astype(r.dtype)[:, None] * f.sqrt_info
    return r * w, J * w[:, :, None]


def _assemble_dense(graph: PoseGraph, free_mask: Array):
    """Dense H (6K, 6K), g (6K) from all factors; fixed poses contribute as
    constants (their blocks are zeroed)."""
    K = graph.capacity
    n = 6 * K
    H = jnp.zeros((n, n))
    g = jnp.zeros(n)
    free = free_mask.astype(jnp.float32)

    def add_block(H, g, J1, J2, idx1, idx2, r):
        blk = jnp.einsum("nri,nrj->nij", J1, J2)  # (N, 6, 6)
        rows = idx1[:, None] * 6 + jnp.arange(6)[None, :]
        cols = idx2[:, None] * 6 + jnp.arange(6)[None, :]
        H = H.at[rows[:, :, None], cols[:, None, :]].add(blk)
        if r is not None:
            gv = jnp.einsum("nri,nr->ni", J1, r)
            g = g.at[rows].add(gv)
        return H, g

    # priors
    rp, Jp = _prior_terms(graph.poses, graph.priors)
    Jp = Jp * free[graph.priors.idx][:, None, None]
    H, g = add_block(H, g, Jp, Jp, graph.priors.idx, graph.priors.idx, rp)

    # betweens
    rb, Ji, Jj = _between_terms(graph.poses, graph.betweens)
    Ji = Ji * free[graph.betweens.i][:, None, None]
    Jj = Jj * free[graph.betweens.j][:, None, None]
    H, g = add_block(H, g, Ji, Ji, graph.betweens.i, graph.betweens.i, rb)
    H, g = add_block(H, g, Jj, Jj, graph.betweens.j, graph.betweens.j, rb)
    H, _ = add_block(H, g, Ji, Jj, graph.betweens.i, graph.betweens.j, None)
    H, _ = add_block(H, g, Jj, Ji, graph.betweens.j, graph.betweens.i, None)

    # gps
    rg, Jg = _gps_terms(graph.poses, graph.gps)
    Jg = Jg * free[graph.gps.idx][:, None, None]
    H, g = add_block(H, g, Jg, Jg, graph.gps.idx, graph.gps.idx, rg)

    return H, g


@partial(jax.jit, static_argnames=("iters",))
def optimize(graph: PoseGraph, free_mask: Array | None = None,
             iters: int = 5, damping: float = 1e-6) -> PoseGraph:
    """Batched Gauss-Newton over the whole graph (dense normal equations).

    free_mask: which poses may move (None = all valid poses); poses outside
    stay fixed — used for windowed odometry updates where old history is
    frozen (approximating iSAM2's unaffected-clique reuse).
    """
    if free_mask is None:
        free_mask = graph.pose_mask

    def gn_step(_, graph):
        H, g = _assemble_dense(graph, free_mask)
        K = graph.capacity
        # inactive/fixed pose blocks: identity rows so Cholesky stays PD
        diag_mask = jnp.repeat(free_mask & graph.pose_mask, 6)
        n = 6 * K
        H = H + jnp.diag(jnp.where(diag_mask, damping, 1.0))
        g = g * diag_mask
        L = jnp.linalg.cholesky(H)
        y = jax.scipy.linalg.solve_triangular(L, -g[:, None], lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)[:, 0]
        dx = (dx * diag_mask).reshape(K, 6)
        new_poses = se3.pose_retract(graph.poses, dx)
        return graph._replace(poses=new_poses)

    return jax.lax.fori_loop(0, iters, gn_step, graph)


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_cg(graph: PoseGraph, free_mask: Array | None = None,
                iters: int = 5, cg_iters: int = 50,
                damping: float = 1e-4) -> PoseGraph:
    """Gauss-Newton with a matrix-free preconditioned-CG inner solve.

    The normal-equation matvec is computed factor-wise (two batched einsums +
    scatter-adds per factor table) without materializing H, so memory is
    O(K*36) instead of O(K^2*36) — the path for graphs beyond ~1k keyframes
    where the dense Cholesky of :func:`optimize` stops fitting.  Block-Jacobi
    (6x6 diagonal blocks) preconditioning."""
    if free_mask is None:
        free_mask = graph.pose_mask

    K = graph.capacity

    def gn_step(_, graph):
        free = (free_mask & graph.pose_mask).astype(jnp.float32)

        rp, Jp = _prior_terms(graph.poses, graph.priors)
        rb, Ji, Jj = _between_terms(graph.poses, graph.betweens)
        rg, Jg = _gps_terms(graph.poses, graph.gps)
        Jp = Jp * free[graph.priors.idx][:, None, None]
        Ji = Ji * free[graph.betweens.i][:, None, None]
        Jj = Jj * free[graph.betweens.j][:, None, None]
        Jg = Jg * free[graph.gps.idx][:, None, None]

        def matvec(x):                      # x: (K, 6)
            y = jnp.zeros((K, 6))
            # priors
            v = jnp.einsum("nri,ni->nr", Jp, x[graph.priors.idx])
            y = y.at[graph.priors.idx].add(jnp.einsum("nri,nr->ni", Jp, v))
            # betweens (cross blocks included)
            v = (jnp.einsum("nri,ni->nr", Ji, x[graph.betweens.i])
                 + jnp.einsum("nri,ni->nr", Jj, x[graph.betweens.j]))
            y = y.at[graph.betweens.i].add(jnp.einsum("nri,nr->ni", Ji, v))
            y = y.at[graph.betweens.j].add(jnp.einsum("nri,nr->ni", Jj, v))
            # gps
            v = jnp.einsum("nri,ni->nr", Jg, x[graph.gps.idx])
            y = y.at[graph.gps.idx].add(jnp.einsum("nri,nr->ni", Jg, v))
            return y + damping * x

        # gradient
        g = jnp.zeros((K, 6))
        g = g.at[graph.priors.idx].add(jnp.einsum("nri,nr->ni", Jp, rp))
        g = g.at[graph.betweens.i].add(jnp.einsum("nri,nr->ni", Ji, rb))
        g = g.at[graph.betweens.j].add(jnp.einsum("nri,nr->ni", Jj, rb))
        g = g.at[graph.gps.idx].add(jnp.einsum("nri,nr->ni", Jg, rg))

        # block-Jacobi preconditioner
        D = jnp.zeros((K, 6, 6))
        D = D.at[graph.priors.idx].add(jnp.einsum("nri,nrj->nij", Jp, Jp))
        D = D.at[graph.betweens.i].add(jnp.einsum("nri,nrj->nij", Ji, Ji))
        D = D.at[graph.betweens.j].add(jnp.einsum("nri,nrj->nij", Jj, Jj))
        D = D.at[graph.gps.idx].add(jnp.einsum("nri,nrj->nij", Jg, Jg))
        D = D + (damping + 1e-6) * jnp.eye(6)
        Dinv = jnp.linalg.inv(D)

        def precond(x):
            return jnp.einsum("nij,nj->ni", Dinv, x)

        b = -g

        def cg_body(k, st):
            x, r, z, pdir, rz = st
            Ap = matvec(pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-12)
            x = x + alpha * pdir
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            pdir = z + beta * pdir
            return x, r, z, pdir, rz_new

        x0 = jnp.zeros((K, 6))
        r0 = b
        z0 = precond(r0)
        st = (x0, r0, z0, z0, jnp.sum(r0 * z0))
        x, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, st)
        dx = x * free[:, None]
        return graph._replace(poses=se3.pose_retract(graph.poses, dx))

    return jax.lax.fori_loop(0, iters, gn_step, graph)


def total_error(graph: PoseGraph) -> Array:
    """Sum of squared whitened residuals (gtsam graph.error() analogue)."""
    rp, _ = _prior_terms(graph.poses, graph.priors)
    rb, _, _ = _between_terms(graph.poses, graph.betweens)
    rg, _ = _gps_terms(graph.poses, graph.gps)
    return jnp.sum(rp * rp) + jnp.sum(rb * rb) + jnp.sum(rg * rg)
