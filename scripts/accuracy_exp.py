"""Accuracy experiment harness: replay the bench.py workload on CPU with
parameter overrides and report trajectory error + iteration stats.

The bench's trajectory error is backend-independent (same program, same
inputs), so accuracy sweeps run here on CPU where compiles are seconds, not
the 10-50 min of the tunneled TPU runtime (CLAUDE.md).

Usage:
  python scripts/accuracy_exp.py --scans 96 --horizon 1800 \
      --set scan2map_max_iters=30 --set vox_surf_leaf=0.5 [--traj circle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def parse_override(s: str):
    k, v = s.split("=", 1)
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            continue
    return k, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=96)
    ap.add_argument("--n-scan", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=1800)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--traj", default="circle")
    ap.add_argument("--radius", type=float, default=10.0)
    ap.add_argument("--speed", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--noise", type=float, default=0.01,
                    help="lidar range noise sigma [m]")
    ap.add_argument("--imu-noise-scale", type=float, default=1.0)
    ap.add_argument("--ri", action="store_true",
                    help="feed the range-image grid keys (the bench's "
                         "upload path) instead of xyz rows")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--dump", default=None,
                    help="write per-scan est/gt/err arrays to this .npz")
    args = ap.parse_args()

    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.utils import sim

    n_scan, horizon = args.n_scan, args.horizon
    over = dict(parse_override(s) for s in args.overrides)
    p = LioParams(
        n_scan=n_scan, horizon_scan=horizon,
        max_points=n_scan * horizon + 64,
        loop_closure_enabled=False,
        max_keyframes=256,
        **over,
    )

    world = sim.World()
    traj = sim.SimTrajectory(kind=args.traj, radius=args.radius,
                             speed=args.speed)
    data = sim.make_dataset(world, traj, n_scans=args.scans, scan_dt=0.1,
                            n_scan=n_scan, horizon=horizon, seed=args.seed,
                            noise=args.noise,
                            imu_noise_gyr=1e-3 * args.imu_noise_scale,
                            imu_noise_acc=1e-2 * args.imu_noise_scale)

    lio = LioSam(p, window=args.window)
    t0 = time.perf_counter()
    iters = []
    keys = ("xyz", "ring", "time_rel", "scan_start", "imu_t", "imu_gyro",
            "imu_acc", "imu_rpy")
    if args.ri:
        keys += ("ranges", "azimuth", "col_time", "elev")
    for i in range(0, args.scans, args.window):
        batch = data[i:i + args.window]
        outs = lio.process_window([{k: s[k] for k in keys} for s in batch])
        iters.append(np.asarray(outs.s2m_iterations)[:len(batch)])
    lio.flush()
    wall = time.perf_counter() - t0
    iters = np.concatenate(iters)

    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    gtR = np.stack([s["gt_pose"][:3, :3] for s in data])
    mats = lio.trajectory.as_matrices()
    est = mats[:, :3, 3]
    n = min(len(est), len(gt))
    errs = np.linalg.norm(est[:n] - gt[:n], axis=1)
    # error decomposition: which DOF drifts
    dpos = est[:n] - gt[:n]
    from scipy.spatial.transform import Rotation as Rs
    rot_err = Rs.from_matrix(
        np.einsum("nij,nkj->nik", mats[:n, :3, :3], gtR[:n]))  # est gt^T
    rpy_err = rot_err.as_euler("xyz", degrees=True)

    if args.dump:
        np.savez(args.dump, est=mats[:n], gt_pos=gt[:n], gt_rot=gtR[:n],
                 err=errs, rpy_err=rpy_err,
                 iters=iters, kf_count=int(lio.state.kf.count))

    print(json.dumps({
        "overrides": over, "traj": args.traj, "scans": args.scans,
        "max_traj_err_m": round(float(errs.max()), 4),
        "final_err_m": round(float(errs[-1]), 4),
        "final_err_xyz": [round(float(v), 4) for v in dpos[-1]],
        "final_err_rpy_deg": [round(float(v), 3) for v in rpy_err[-1]],
        "max_abs_rpy_deg": [round(float(v), 3)
                            for v in np.abs(rpy_err).max(axis=0)],
        "mean_iters": round(float(iters.mean()), 2),
        "max_iters": int(iters.max()),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
