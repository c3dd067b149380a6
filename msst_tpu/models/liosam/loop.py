"""Loop closure: the second, lower-rate compiled program.

Rebuild of the reference's loop-closure thread
(``mapOptmization.cpp:503-608,1477-1495``): radius-search the keyframe
positions for an old (>30 s) keyframe near the newest one, assemble a
+-N-keyframe submap, run ICP, and on fitness < 0.3 add a between factor and
re-optimize the whole graph (iSAM2 gets 5 extra update passes after a loop,
:1540-1548 — here a full-graph Gauss-Newton with all poses free).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import graph as graph_ops
from ...ops import registration, se3, voxel
from ...ops.pointcloud import Cloud
from .params import LioParams
from .state import LioState

Array = jax.Array


class LoopResult(NamedTuple):
    found: Array      # () bool — a loop factor was added
    cur: Array        # () int32 current keyframe index
    cand: Array       # () int32 matched old keyframe index
    fitness: Array    # () ICP fitness
    icp_iters: Array = jnp.asarray(0, jnp.int32)  # ICP iterations run


def _submap(state: LioState, center: Array, half_width: Array, p: LioParams,
            cap: int) -> Cloud:
    """Merged corner+surf clouds of keyframes [center-h, center+h] in map
    frame, voxel-downsampled (``loopFindNearKeyframes`` :699-721)."""
    kf = state.kf
    K = kf.pose6.shape[0]
    S = p.history_keyframe_search_num * 2 + 1
    offs = jnp.arange(S) - p.history_keyframe_search_num
    idx = center + offs
    ok = (idx >= 0) & (idx < kf.count) & (jnp.abs(offs) <= half_width)
    idx = jnp.clip(idx, 0, K - 1)

    poses = se3.Pose.from_vec6(kf.pose6[idx])
    corner = poses.apply(kf.corner_xyz[idx])
    surf = poses.apply(kf.surf_xyz[idx])
    xyz = jnp.concatenate([corner.reshape(-1, 3), surf.reshape(-1, 3)], axis=0)
    mask = jnp.concatenate([
        (kf.corner_mask[idx] & ok[:, None]).reshape(-1),
        (kf.surf_mask[idx] & ok[:, None]).reshape(-1),
    ])
    return voxel.voxel_downsample(
        Cloud.create(xyz, mask=mask), p.loop_leaf_size, capacity=cap)


def _keyframe_cloud(state: LioState, idx: Array, p: LioParams) -> Cloud:
    """Single keyframe's merged corner+surf cloud in map frame, downsampled
    (``loopFindNearKeyframes`` with searchNum=0, :699-721).  Separate from
    :func:`_submap` so the ICP *source* side stays at the one-keyframe
    capacity (kf caps) instead of the 51-keyframe submap cap — the ICP
    iteration cost scales with the padded source row count, and round 3
    measured the oversized source as a ~2.4x multiplier on every
    loop-closure attempt."""
    kf = state.kf
    pose = se3.Pose.from_vec6(kf.pose6[idx])
    xyz = jnp.concatenate([pose.apply(kf.corner_xyz[idx]),
                           pose.apply(kf.surf_xyz[idx])], axis=0)
    mask = jnp.concatenate([kf.corner_mask[idx], kf.surf_mask[idx]])
    return voxel.voxel_downsample(
        Cloud.create(xyz, mask=mask), p.loop_leaf_size,
        capacity=p.kf_corner_cap + p.kf_surf_cap)


@partial(jax.jit, static_argnames=("p",), donate_argnums=(0,))
def loop_closure_step(state: LioState, p: LioParams):
    """Detect + close one loop; returns (new_state, LoopResult).

    The state is donated like the odometry step's: without donation every
    attempt reallocates + copies the ~100 MB keyframe store (and pays the
    tunneled runtime's per-buffer bookkeeping), which round 3 measured as
    the bulk of the loop-ON throughput drop even when no candidate exists.
    Callers must rebind (``state, res = loop_closure_step(state, p)``)."""
    kf = state.kf
    K = kf.pose6.shape[0]
    cur = jnp.maximum(kf.count - 1, 0)
    cur_pos = kf.positions[cur]
    cur_time = kf.time[cur]

    # detectLoopClosureDistance :610-643, extended to the top-k nearest
    # eligible keyframes per attempt (round-3 VERDICT #5): the while_loop
    # below tries them nearest-first and stops at the first ICP success, so
    # k=1 reproduces the reference's single-nearest semantics exactly and
    # k>1 only costs when the nearest candidate's ICP fails
    d2 = jnp.sum((kf.positions - cur_pos) ** 2, axis=1)
    old = (cur_time - kf.time) > p.history_keyframe_search_time_diff
    elig = kf.mask & old
    d2 = jnp.where(elig, d2, jnp.inf)
    n_cand = min(max(p.loop_candidates, 1), K)
    neg_d2, cands = jax.lax.top_k(-d2, n_cand)          # nearest first
    cands_ok = (kf.count > 1) & (
        -neg_d2 < p.history_keyframe_search_radius**2)

    cur_cloud = _keyframe_cloud(state, cur, p)

    def try_close(cand):
        hist_cloud = _submap(state, cand,
                             jnp.asarray(p.history_keyframe_search_num), p,
                             p.loop_submap_cap)
        # brute-force correspondence sweep: at ~10k x ~50k the hash-grid
        # gather path costs ~100x more per iteration on TPU
        # (knn.nearest1_brute); no grid build, exact NN
        res = registration.icp_point2point_brute(
            cur_cloud.xyz, cur_cloud.mask, hist_cloud.xyz, hist_cloud.mask,
            se3.Pose.identity(), max_iters=100,
            # setMaxCorrespondenceDistance(radius*2), :560; the epsilons of
            # :562-563 (setTransformationEpsilon / setEuclideanFitnessEpsilon)
            max_corr_dist=p.history_keyframe_search_radius * 2.0,
            transformation_eps=1e-6, rel_mse_eps=1e-6,
        )
        if p.loop_icp_refine_dist > 0.0:
            # coarse-to-fine (DEVIATION, improvement over the reference's
            # single 30 m-correspondence pass): re-run from the coarse pose
            # with a tight correspondence gate so salient structure (pillar
            # faces, corners) locks the alignment instead of the dense
            # weakly-textured bulk (measured: removes ~0.3 m of along-
            # corridor bias in dumbbell start-zone loop measurements)
            res2 = registration.icp_point2point_brute(
                cur_cloud.xyz, cur_cloud.mask, hist_cloud.xyz,
                hist_cloud.mask, res.pose, max_iters=50,
                max_corr_dist=p.loop_icp_refine_dist,
                transformation_eps=1e-6, rel_mse_eps=1e-6,
            )
            use2 = res2.converged & (res2.fitness <= res.fitness)
            res = jax.tree.map(lambda a, b: jnp.where(use2, a, b), res2, res)
        good = res.converged & (res.fitness < p.history_keyframe_fitness_score)
        return good, res.pose, res.fitness, res.iters

    def no_close():
        return (jnp.asarray(False), se3.Pose.identity(),
                jnp.asarray(jnp.inf), jnp.asarray(0, jnp.int32))

    def cand_cond(st):
        i, good, *_ = st
        return (i < n_cand) & ~good

    def cand_body(st):
        i, _, _, _, _, _ = st
        g, pose, fit, it = jax.lax.cond(cands_ok[i],
                                        lambda: try_close(cands[i]), no_close)
        return (i + 1, g, pose, fit, it, cands[i])

    _, good, icp_pose, fitness, icp_iters, cand = jax.lax.while_loop(
        cand_cond, cand_body,
        (jnp.asarray(0, jnp.int32), *no_close(), jnp.asarray(0, jnp.int32)))

    def add_loop(state):
        graph = state.graph
        # corrected current pose, relative to candidate (``performLoopClosure``
        # :575-604: poseFrom = icp * current, poseTo = candidate)
        t_cur = se3.Pose.from_vec6(kf.pose6[cur])
        t_cand = se3.Pose.from_vec6(kf.pose6[cand])
        corrected = icp_pose.compose(t_cur)
        meas = t_cand.between(corrected).inverse()  # factor cur -> cand
        sigma = jnp.maximum(fitness, 1e-2)
        si = jnp.full(6, 1.0) / sigma
        if p.loop_degeneracy_ratio > 0.0:
            # Anisotropic loop information (DEVIATION, an improvement over
            # the reference's fitness-only acceptance :575-580): probe the
            # ICP cost curvature per axis with re-association
            # (registration.icp_curvature_brute).  A corridor-to-corridor
            # revisit slides freely along the corridor axis while passing
            # the fitness gate; scaling that axis's information toward zero
            # keeps the loop's REAL constraints (lateral, vertical, yaw)
            # without injecting an arbitrary along-axis measurement.
            hist = _submap(state, cand,
                           jnp.asarray(p.history_keyframe_search_num), p,
                           p.loop_submap_cap)
            kappa, _ = registration.icp_curvature_brute(
                cur_cloud.xyz, cur_cloud.mask, hist.xyz, hist.mask,
                icp_pose,
                max_corr_dist=p.history_keyframe_search_radius * 2.0)

            def axis_w(k3):
                s = k3 / jnp.maximum(jnp.max(k3), 1e-12)
                return jnp.clip(s / p.loop_degeneracy_ratio, 0.02, 1.0)

            Rw = se3.quat_to_matrix(corrected.q)
            # world-frame diagonal curvature -> factor-local axes (the
            # between residual's tangent frame ~ the current pose's frame)
            def to_local(w3):
                return jnp.clip(jnp.diag(Rw.T @ jnp.diag(w3) @ Rw),
                                0.02, 1.0)

            w_rot = to_local(axis_w(jnp.maximum(kappa[:3], 0.0)))
            w_trans = to_local(axis_w(jnp.maximum(kappa[3:], 0.0)))
            si = si * jnp.concatenate([w_rot, w_trans])
        bslot = jnp.minimum(K - 1 + state.n_loop,
                            graph.betweens.i.shape[0] - 1)
        b = graph.betweens
        b = b._replace(
            i=b.i.at[bslot].set(cur),
            j=b.j.at[bslot].set(cand),
            meas=se3.Pose(b.meas.q.at[bslot].set(meas.q),
                          b.meas.t.at[bslot].set(meas.t)),
            sqrt_info=b.sqrt_info.at[bslot].set(si),
            mask=b.mask.at[bslot].set(True),
        )
        graph = graph._replace(betweens=b)
        # full-graph re-optimization (the post-loop extra iSAM passes);
        # solver auto-selects dense vs matrix-free CG by capacity
        from .mapping import _graph_optimize
        graph = _graph_optimize(graph, p, iters=7)
        opt6 = se3.Pose(graph.poses.q, graph.poses.t).to_vec6()
        new_kf = kf._replace(pose6=jnp.where(kf.mask[:, None], opt6, kf.pose6))
        # history was rewritten -> the cached local map is stale; rebuild it
        # (the reference clears laserCloudMapContainer in ``correctPoses``
        # :1583-1614 for the same reason)
        from .mapping import (_rebake_local_map, _rebuild_local_map,
                              _use_incremental)
        if _use_incremental(p):
            local_map, baked_pose6, baked = _rebake_local_map(
                new_kf, new_kf.pose6[cur][3:], new_kf.time[cur], p)
            new_kf = new_kf._replace(baked_pose6=baked_pose6, baked=baked)
        else:
            local_map = _rebuild_local_map(new_kf, new_kf.pose6[cur][3:],
                                           new_kf.time[cur], p)
        return state._replace(
            kf=new_kf, graph=graph, n_loop=state.n_loop + 1, local_map=local_map,
            pose6=new_kf.pose6[cur], loop_closed=jnp.asarray(True),
        )

    new_state = jax.lax.cond(good, add_loop, lambda s: s, state)
    return new_state, LoopResult(good, cur, cand, fitness, icp_iters)
