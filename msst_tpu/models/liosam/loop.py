"""Loop closure: the second, lower-rate compiled program.

Rebuild of the reference's loop-closure thread
(``mapOptmization.cpp:503-608,1477-1495``): radius-search the keyframe
positions for an old (>30 s) keyframe near the newest one, assemble a
+-N-keyframe submap, run ICP, and on fitness < 0.3 add a between factor and
re-optimize the whole graph (iSAM2 gets 5 extra update passes after a loop,
:1540-1548 — here a full-graph Gauss-Newton with all poses free).

Structure (round-5 redesign; DEVIATION, an improvement over the reference's
single full-density point-to-point ICP ``performLoopClosure`` :559-573):

* COARSE — point-to-point brute ICP on 2x-leaf downsampled clouds (the wide
  30 m correspondence basin of the reference, at ~1/16 the per-iteration
  sweep cost: the brute NN cost is quadratic in the padded cloud sizes).
* FINE (``loop_fine="plane"``) — per-class line/plane Gauss-Newton against
  voxel feature maps of the history submap (the scan-to-map machinery,
  ``registration.scan_to_map_voxel``).  Point-to-plane costs are exactly
  what the corridor workload needs: sliding along a wall plane is a ZERO
  residual, so the corridor's point mass cannot out-vote the sparse pillar
  geometry the way it does in the point-to-point cost (measured r4: a
  ~0.7 m along-corridor floor on the dumbbell drive that no correspondence
  gating removed).  Corner features match line fits, surf features match
  plane fits — the keyframe store keeps the classes separate.
* The acceptance gate stays reference-faithful: point-to-point fitness
  (``getFitnessScore`` semantics) on the full-density merged clouds.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import registration, se3, voxel, voxelmap
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


def _submap_caps(p: LioParams) -> tuple[int, int]:
    """(corner, surf) capacities of the per-class history submap; together
    they cover the same full-density budget as the round-4 merged
    ``loop_submap_cap`` (corners are ~1/5 of the feature mass)."""
    return max(p.loop_submap_cap // 4, p.kf_corner_cap), p.loop_submap_cap


def _coarse_caps(p: LioParams) -> tuple[int, int]:
    """(cur, hist) capacities of the coarse-stage clouds: the full-density
    budgets divided by loop_coarse_factor**? — a loop_coarse_factor x leaf
    cuts occupied cells ~4-8x per doubling, so capacity shrinks by the
    squared factor (the brute sweep cost is quadratic in padded sizes)."""
    cc, sc = _submap_caps(p)
    div = max(p.loop_coarse_factor, 1) ** 2
    return max((p.kf_corner_cap + p.kf_surf_cap) // div, 256), \
        max((cc + sc) // div, 1024)


def _kf_class_clouds(state: LioState, idx: Array, p: LioParams
                     ) -> tuple[Cloud, Cloud]:
    """Current keyframe's corner and surf clouds in map frame, separately
    voxel-downsampled (``loopFindNearKeyframes`` with searchNum=0,
    :699-721).  The ICP *source* stays at single-keyframe capacity: the
    sweep cost scales with the padded source rows (round 3 measured an
    oversized source as a ~2.4x multiplier per attempt)."""
    kf = state.kf
    pose = se3.Pose.from_vec6(kf.pose6[idx])
    corner = voxel.voxel_downsample(
        Cloud.create(pose.apply(kf.corner_xyz[idx]),
                     mask=kf.corner_mask[idx]),
        p.loop_leaf_size, capacity=p.kf_corner_cap)
    surf = voxel.voxel_downsample(
        Cloud.create(pose.apply(kf.surf_xyz[idx]), mask=kf.surf_mask[idx]),
        p.loop_leaf_size, capacity=p.kf_surf_cap)
    return corner, surf


def _submap_class_clouds(state: LioState, center: Array, p: LioParams
                         ) -> tuple[Cloud, Cloud]:
    """History submap of keyframes [center-N, center+N] in map frame, per
    class, voxel-downsampled (``loopFindNearKeyframes`` :699-721)."""
    kf = state.kf
    K = kf.pose6.shape[0]
    S = p.history_keyframe_search_num * 2 + 1
    offs = jnp.arange(S) - p.history_keyframe_search_num
    idx = center + offs
    ok = (idx >= 0) & (idx < kf.count)
    idx = jnp.clip(idx, 0, K - 1)
    poses = se3.Pose.from_vec6(kf.pose6[idx])
    cc, sc = _submap_caps(p)

    def build(xyz, mask, cap):
        world = poses.apply(xyz[idx])
        m = (mask[idx] & ok[:, None]).reshape(-1)
        return voxel.voxel_downsample(
            Cloud.create(world.reshape(-1, 3), mask=m),
            p.loop_leaf_size, capacity=cap)

    return (build(kf.corner_xyz, kf.corner_mask, cc),
            build(kf.surf_xyz, kf.surf_mask, sc))


def _merge(a: Cloud, b: Cloud) -> tuple[Array, Array]:
    return (jnp.concatenate([a.xyz, b.xyz], axis=0),
            jnp.concatenate([a.mask, b.mask], axis=0))


def _coarsen(xyz: Array, mask: Array, p: LioParams, cap: int) -> Cloud:
    return voxel.voxel_downsample(
        Cloud.create(xyz, mask=mask),
        max(p.loop_coarse_factor, 1) * p.loop_leaf_size, capacity=cap)


def _p2p_fitness(src_xyz, src_mask, tgt_xyz, tgt_mask, pose: se3.Pose,
                 max_dist: float) -> Array:
    """Mean squared NN distance of matched points at `pose` — PCL
    ``getFitnessScore`` on the full-density clouds, the reference's
    acceptance quantity (``performLoopClosure`` :575-580)."""
    from ...ops import knn

    moved = pose.apply(src_xyz)
    res = knn.nearest1_brute(tgt_xyz, tgt_mask, moved, src_mask)
    ok = res.valid[:, 0] & src_mask & (res.sqdist[:, 0] <= max_dist * max_dist)
    nm = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, res.sqdist[:, 0], 0.0)) / nm


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

    def no_close():
        return (jnp.asarray(False), se3.Pose.identity(),
                jnp.asarray(jnp.inf), jnp.asarray(0, jnp.int32))

    def no_attempt(state):
        return state, LoopResult(jnp.asarray(False), cur,
                                 jnp.asarray(0, jnp.int32),
                                 jnp.asarray(jnp.inf),
                                 jnp.asarray(0, jnp.int32))

    def attempt(state):
        # source clouds are candidate-independent; building them inside the
        # any-candidate branch keeps the common no-candidate attempt free
        # (ADVICE r4 low: the hoisted build cost every 1 Hz step)
        cur_c, cur_s = _kf_class_clouds(state, cur, p)
        cur_xyz, cur_mask = _merge(cur_c, cur_s)
        cap_cur, cap_hist = _coarse_caps(p)
        cur_coarse = _coarsen(cur_xyz, cur_mask, p, cap_cur)

        def try_close(cand):
            hist_c, hist_s = _submap_class_clouds(state, cand, p)
            hist_xyz, hist_mask = _merge(hist_c, hist_s)
            hist_coarse = _coarsen(hist_xyz, hist_mask, p, cap_hist)
            # COARSE: point-to-point on 2x-leaf clouds — the reference's
            # wide basin (setMaxCorrespondenceDistance(radius*2) :560, the
            # epsilons of :562-563) at ~1/16 the sweep cost
            res = registration.icp_point2point_brute(
                cur_coarse.xyz, cur_coarse.mask, hist_coarse.xyz,
                hist_coarse.mask, se3.Pose.identity(), max_iters=100,
                max_corr_dist=p.history_keyframe_search_radius * 2.0,
                transformation_eps=1e-6, rel_mse_eps=1e-6,
            )
            pose, iters = res.pose, res.iters
            fit = _p2p_fitness(cur_xyz, cur_mask, hist_xyz, hist_mask, pose,
                               p.history_keyframe_search_radius * 2.0)
            if p.loop_fine == "plane":
                # FINE: per-class line/plane GN against voxel features of
                # the history submap — two passes, 2x leaf then 1x, so the
                # first pass's wider cells absorb the coarse stage's
                # residual error (the lookup reaches ~1 cell)
                origin = kf.positions[cand]

                def gn(pose6, leaf_mul, iters):
                    cvox = voxelmap.build(
                        hist_c.xyz, hist_c.mask, leaf_mul * p.vox_corner_leaf,
                        p.vox_corner_cap, "line",
                        table_size=2 * p.vox_corner_cap, origin=origin)
                    svox = voxelmap.build(
                        hist_s.xyz, hist_s.mask, leaf_mul * p.vox_surf_leaf,
                        p.vox_surf_cap, "plane",
                        table_size=2 * p.vox_surf_cap, origin=origin,
                        plane_min_spread=p.vox_plane_min_spread)
                    r = registration.scan_to_map_voxel(
                        cur_c.xyz, cur_c.mask, cur_s.xyz, cur_s.mask,
                        cvox, svox, pose6, max_iters=iters,
                        eig_threshold=p.degeneracy_threshold)
                    return r.pose
                # pose6 parameterization: the GN applies R(rpy) x + t like
                # Pose.from_vec6 — exact round-trip through to_vec6.
                # Three leaf rungs: the 4x pass's ~3 m association reach
                # re-captures salient structure (pillars) when the coarse
                # p2p stage converged with multi-meter along-corridor bias
                # (the corridor point mass out-votes sparse pillars in the
                # p2p cost; measured r5 — without this rung, start-zone
                # loops under 2.4 m of real drift measured ~zero x offset)
                fine6 = gn(gn(gn(pose.to_vec6(), 4.0, 8), 2.0, 8), 1.0, 12)
                fine_pose = se3.Pose.from_vec6(fine6)
                fine_fit = _p2p_fitness(cur_xyz, cur_mask, hist_xyz,
                                        hist_mask, fine_pose,
                                        p.history_keyframe_search_radius * 2.0)
                # accept the fine pose unless it degraded the p2p fitness
                # badly (a guard, not a preference: point-to-plane lets the
                # pose slide along planes, which p2p fitness mildly
                # penalizes even when the slide is the CORRECT correction)
                use_fine = jnp.isfinite(fine_fit) & (fine_fit < 2.0 * fit)
                pose = jax.tree.map(
                    lambda a, b: jnp.where(use_fine, a, b), fine_pose, pose)
                fit = jnp.where(use_fine, fine_fit, fit)
            elif p.loop_fine == "p2p" and p.loop_icp_refine_dist > 0.0:
                # round-4 behavior: tight point-to-point second pass
                res2 = registration.icp_point2point_brute(
                    cur_xyz, cur_mask, hist_xyz, hist_mask, pose,
                    max_iters=50, max_corr_dist=p.loop_icp_refine_dist,
                    transformation_eps=1e-6, rel_mse_eps=1e-6,
                )
                use2 = res2.converged & (res2.fitness <= fit)
                pose = jax.tree.map(
                    lambda a, b: jnp.where(use2, a, b), res2.pose, pose)
                fit = jnp.where(use2, res2.fitness, fit)
            good = res.converged & (fit < p.history_keyframe_fitness_score)
            return good, pose, fit, iters

        def cand_cond(st):
            i, good, *_ = st
            return (i < n_cand) & ~good

        def cand_body(st):
            i, _, _, _, _, _ = st
            g, pose, fit, it = jax.lax.cond(
                cands_ok[i], lambda: try_close(cands[i]), no_close)
            return (i + 1, g, pose, fit, it, cands[i])

        _, good, icp_pose, fitness, icp_iters, cand = jax.lax.while_loop(
            cand_cond, cand_body,
            (jnp.asarray(0, jnp.int32), *no_close(),
             jnp.asarray(0, jnp.int32)))

        def add_loop(state):
            graph = state.graph
            # corrected current pose, relative to candidate
            # (``performLoopClosure`` :575-604: poseFrom = icp * current,
            # poseTo = candidate)
            t_cur = se3.Pose.from_vec6(kf.pose6[cur])
            t_cand = se3.Pose.from_vec6(kf.pose6[cand])
            corrected = icp_pose.compose(t_cur)
            meas = t_cand.between(corrected).inverse()  # factor cur -> cand
            sigma = jnp.maximum(fitness, 1e-2)
            si = jnp.full(6, 1.0) / sigma
            if p.loop_degeneracy_ratio > 0.0:
                # Anisotropic loop information (DEVIATION, an improvement
                # over the reference's fitness-only acceptance :575-580):
                # probe the ICP cost curvature per axis with re-association
                # (registration.icp_curvature_brute).  A corridor-to-
                # corridor revisit slides freely along the corridor axis
                # while passing the fitness gate; scaling that axis's
                # information toward zero keeps the loop's REAL constraints
                # (lateral, vertical, yaw) without injecting an arbitrary
                # along-axis measurement.  Probed on the 2x-leaf coarse
                # clouds (13 sweeps at 1/16 cost; probe deltas 1.5 m /
                # 0.1 rad still dwarf the 0.8 m coarse point spacing).
                hist_c, hist_s = _submap_class_clouds(state, cand, p)
                hist_xyz, hist_mask = _merge(hist_c, hist_s)
                hist_coarse = _coarsen(hist_xyz, hist_mask, p, cap_hist)
                kappa, _ = registration.icp_curvature_brute(
                    cur_coarse.xyz, cur_coarse.mask, hist_coarse.xyz,
                    hist_coarse.mask, icp_pose,
                    max_corr_dist=p.history_keyframe_search_radius * 2.0)

                def axis_w(k3):
                    s = k3 / jnp.maximum(jnp.max(k3), 1e-12)
                    return jnp.clip(s / p.loop_degeneracy_ratio, 0.02, 1.0)

                Rw = se3.quat_to_matrix(corrected.q)
                # world-frame diagonal curvature -> factor-local axes (the
                # between residual's tangent frame ~ the current pose's
                # frame)
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
            new_kf = kf._replace(
                pose6=jnp.where(kf.mask[:, None], opt6, kf.pose6))
            # history was rewritten -> the cached local map is stale;
            # rebuild it (the reference clears laserCloudMapContainer in
            # ``correctPoses`` :1583-1614 for the same reason)
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
                kf=new_kf, graph=graph, n_loop=state.n_loop + 1,
                local_map=local_map, pose6=new_kf.pose6[cur],
                loop_closed=jnp.asarray(True),
            )

        new_state = jax.lax.cond(good, add_loop, lambda s: s, state)
        return new_state, LoopResult(good, cur, cand, fitness, icp_iters)

    # the whole attempt (cloud builds included) is gated on an eligible
    # candidate existing — the common no-candidate step costs only the
    # detection top-k (ADVICE r4 low)
    return jax.lax.cond(jnp.any(cands_ok), attempt, no_attempt, state)
