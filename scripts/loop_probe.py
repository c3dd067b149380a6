"""Loop-closure program cost probe (bench shapes, no window program).

The round-3 loop-ON bench phase stayed ~8x slower than odometry even after
the brute-force ICP landed, with only ~4 loop dispatches in the timed
region — so each attempt must cost seconds, and the stage-level suspects
(ICP iterations, graph solve, rebake) need a direct measurement.

Builds a loop-ready ``LioState`` synthetically: keyframes on a revisiting
circle with geometrically consistent clouds (raycast at each keyframe pose,
features downsampled like the pipeline's insert path), a well-posed factor
graph (prior + odometry chain), times spanning the 30 s age gate.  Then
times CHAINED ``loop_closure_step`` dispatches with donated state and ONE
final D2H readback — the same dispatch pattern the pipeline uses.
Variants:

  nocand   all keyframes young -> the device-side candidate search rejects
           (the cheap branch; measures dispatch + detection overhead)
  found    genuine revisit -> ICP runs, fitness passes, add_loop executes
           (graph re-solve + local-map rebake)

Also reads back LoopResult.icp_iters to show whether the ICP while_loop
converges or burns its 100-iteration cap.

Run with the host otherwise IDLE.  Usage:
  python scripts/loop_probe.py [--reps 8] [--cpu] [--kf 120]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--kf", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scipy.spatial.transform import Rotation as Rs

    from msst_tpu.models.liosam.loop import loop_closure_step
    from msst_tpu.models.liosam.mapping import prepare_scan, unpack_step_input
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.models.liosam.pipeline import LioSam
    from msst_tpu.models.liosam.state import init_state
    from msst_tpu.ops import se3, voxel
    from msst_tpu.ops.pointcloud import Cloud, compact
    from msst_tpu.utils import sim

    n_scan, horizon = (4, 360) if args.cpu else (16, 1800)
    p = LioParams(n_scan=n_scan, horizon_scan=horizon,
                  max_points=n_scan * horizon + 64,
                  loop_closure_enabled=True, max_keyframes=256)

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    lio = LioSam(p, window=1)  # host packer only; no window dispatches

    @jax.jit
    def _feats(pts, ax):
        ps = prepare_scan(unpack_step_input(pts, ax, p), p)
        c = compact(
            voxel.voxel_downsample(
                Cloud.create(ps.corner_xyz, mask=ps.corner_mask),
                p.mapping_corner_leaf_size, capacity=p.scan_corner_cap),
            p.kf_corner_cap)
        s = compact(
            voxel.voxel_downsample(
                Cloud.create(ps.surf_xyz, mask=ps.surf_mask),
                p.mapping_surf_leaf_size, capacity=p.scan_surf_cap),
            p.kf_surf_cap)
        return c, s

    @jax.jit
    def _graph_chain(pose6):
        """prior@0 + odometry betweens for the keyframe chain."""
        poses = se3.Pose.from_vec6(pose6)
        prev = se3.Pose(poses.q[:-1], poses.t[:-1])
        nxt = se3.Pose(poses.q[1:], poses.t[1:])
        return poses, prev.between(nxt)

    # keyframes every kf_dt along the circle: clouds raycast AT each pose so
    # the map is geometrically consistent (ICP on a genuine revisit aligns)
    K = args.kf
    kf_dt = 0.4
    period = 2 * np.pi * traj.radius / traj.speed  # one revolution, ~31.4 s
    rng = np.random.default_rng(11)

    def build_state(young: bool):
        st = init_state(p)
        kf = st.kf
        Kc = kf.pose6.shape[0]
        pose6 = np.zeros((Kc, 6), np.float32)
        tstamp = np.full((Kc,), -1e9, np.float32)
        cx = np.zeros(np.shape(kf.corner_xyz), np.float32)
        cm = np.zeros(np.shape(kf.corner_mask), bool)
        sx = np.zeros(np.shape(kf.surf_xyz), np.float32)
        sm = np.zeros(np.shape(kf.surf_mask), bool)
        for i in range(K):
            t = i * (0.01 if young else kf_dt)
            T = traj.pose(t % period)
            xyz, ring, trel, _ = sim.raycast_scan(
                world, T, n_scan=n_scan, horizon=horizon, rng=rng,
                spin_period=0.1)
            pts, ax = lio._make_input_np(xyz, ring, trel, 0.0)
            c, su = _feats(jnp.asarray(pts), jnp.asarray(ax))
            rpy = Rs.from_matrix(T[:3, :3]).as_euler("xyz")
            pose6[i] = np.concatenate([rpy, T[:3, 3]]).astype(np.float32)
            tstamp[i] = i * (0.01 if young else kf_dt)
            cx[i], cm[i] = np.asarray(c.xyz), np.asarray(c.mask)
            sx[i], sm[i] = np.asarray(su.xyz), np.asarray(su.mask)
        kf = kf._replace(
            pose6=jnp.asarray(pose6), time=jnp.asarray(tstamp),
            corner_xyz=jnp.asarray(cx), corner_mask=jnp.asarray(cm),
            surf_xyz=jnp.asarray(sx), surf_mask=jnp.asarray(sm),
            count=jnp.asarray(K, jnp.int32),
            baked_pose6=jnp.asarray(pose6),
            baked=jnp.asarray(np.arange(Kc) < K),
        )
        poses, meas = _graph_chain(jnp.asarray(pose6))
        g = st.graph
        pr = g.priors
        si6 = jnp.concatenate([jnp.full(3, 1.0 / p.prior_sigma_rot),
                               jnp.full(3, 1.0 / p.prior_sigma_trans)])
        pr = pr._replace(
            idx=pr.idx.at[0].set(0),
            meas=se3.Pose(pr.meas.q.at[0].set(poses.q[0]),
                          pr.meas.t.at[0].set(poses.t[0])),
            sqrt_info=pr.sqrt_info.at[0].set(si6),
            mask=pr.mask.at[0].set(True))
        b = g.betweens
        nb = K - 1
        bsi = jnp.concatenate([jnp.full(3, 1.0 / p.odom_sigma_rot),
                               jnp.full(3, 1.0 / p.odom_sigma_trans)])
        idx = jnp.arange(nb, dtype=jnp.int32)
        b = b._replace(
            i=b.i.at[:nb].set(idx), j=b.j.at[:nb].set(idx + 1),
            meas=se3.Pose(b.meas.q.at[:nb].set(meas.q[:nb]),
                          b.meas.t.at[:nb].set(meas.t[:nb])),
            sqrt_info=b.sqrt_info.at[:nb].set(bsi),
            mask=b.mask.at[:nb].set(True))
        g = g._replace(poses=poses,
                       pose_mask=jnp.asarray(np.arange(Kc) < K),
                       priors=pr, betweens=b)
        return st._replace(kf=kf, graph=g,
                           initialized=jnp.asarray(True),
                           pose6=jnp.asarray(pose6[K - 1]))

    results = {}
    for name, young in (("nocand", True), ("found", False)):
        state = build_state(young)
        state, res = loop_closure_step(state, p)   # compile + warm
        f0 = float(np.asarray(res.fitness))
        it0 = int(np.asarray(res.icp_iters))
        found0 = bool(np.asarray(res.found))
        N = args.reps
        t0 = time.perf_counter()
        for _ in range(N):
            state, res = loop_closure_step(state, p)
        last_found = bool(np.asarray(res.found))    # ONE real D2H sync
        ms = 1000.0 * (time.perf_counter() - t0) / N
        results[name] = {"ms_per_attempt": round(ms, 2),
                         "warm_fitness": round(f0, 4),
                         "warm_icp_iters": it0, "warm_found": found0,
                         "last_found": last_found}

    results["backend"] = jax.devices()[0].platform
    results["kf"] = K
    print(json.dumps(results))


if __name__ == "__main__":
    main()
