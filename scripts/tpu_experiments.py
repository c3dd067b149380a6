"""Serial TPU perf experiments on the bench workload.

The TPU is single-tenant and remote compiles cost 10-50 min each (ignored
compile cache — CLAUDE.md), so experiments run one-per-invocation and are
chosen sparingly.  Prints ONE JSON line like bench.py.

Usage:
  python scripts/tpu_experiments.py --window 32              # window sweep
  python scripts/tpu_experiments.py --no-quant               # f32 uploads
  python scripts/tpu_experiments.py --window 16 --scans 160  # longer run
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
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--scans", type=int, default=96)
    ap.add_argument("--no-quant", action="store_true")
    ap.add_argument("--map-update", default="incremental")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.utils import sim

    n_scan, horizon = 16, 1800
    W = args.window
    p = LioParams(
        n_scan=n_scan, horizon_scan=horizon,
        max_points=n_scan * horizon + 64,
        loop_closure_enabled=False,
        max_keyframes=256,
        quantized_upload=not args.no_quant,
        map_update=args.map_update,
    )
    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    n_warm = W
    data = sim.make_dataset(world, traj, n_scans=n_warm + args.scans,
                            scan_dt=0.1, n_scan=n_scan, horizon=horizon,
                            seed=7)
    lio = LioSam(p, window=W)

    def feed(batch):
        return lio.process_window([
            dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                 scan_start=s["scan_start"], imu_t=s["imu_t"],
                 imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                 imu_rpy=s["imu_rpy"])
            for s in batch
        ])

    for i in range(0, n_warm, W):
        outs = feed(data[i:i + W])
    jax.block_until_ready(outs.pose6)

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + args.scans, W):
        outs = feed(data[i:i + W])
    jax.block_until_ready(outs.pose6)
    wall = time.perf_counter() - t0
    lio.flush()

    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    n = min(len(est), len(gt))
    err = float(np.linalg.norm(est[:n] - gt[:n], axis=1).max())

    print(json.dumps({
        "exp": {"window": W, "quant": not args.no_quant,
                "map_update": args.map_update, "scans": args.scans},
        "scans_per_sec": round(args.scans / wall, 2),
        "ms_per_scan": round(1000.0 * wall / args.scans, 2),
        "max_traj_err_m": round(err, 4),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
