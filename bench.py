"""Benchmark: LIO odometry throughput on the default (TPU) backend.

Prints ONE JSON line:
  {"metric": "lio_odometry_scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": N / 6.67}

Baseline: the reference LIO-SAM's by-design mapping-rate ceiling of
~6.67 Hz (mappingProcessInterval = 0.15 s on 4 CPU cores,
``liosam_ws/src/LIO-SAM/config/params.yaml:72-73``) — see BASELINE.md.
The workload is the full per-scan odometry program (deskew, features,
scan-to-map GN over the keyframe local map, factor update) on VLP-16-sized
scans (16 x 1800) replayed from the synthetic world, steady state after
warm-up, host->device transfer included.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 6.67


def main():
    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.utils import sim

    n_scan, horizon = 16, 1800
    p = LioParams(
        n_scan=n_scan, horizon_scan=horizon,
        max_points=n_scan * horizon + 64,
        loop_closure_enabled=False,
        max_keyframes=256,
    )

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    window = 16
    n_warm, n_bench = window, 80  # warm-up = one full window
    data = sim.make_dataset(world, traj, n_scans=n_warm + n_bench, scan_dt=0.1,
                            n_scan=n_scan, horizon=horizon, seed=7)

    lio = LioSam(p, window=window)

    def feed(batch):
        return lio.process_window([
            dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                 scan_start=s["scan_start"], imu_t=s["imu_t"],
                 imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                 imu_rpy=s["imu_rpy"])
            for s in batch
        ])

    for i in range(0, n_warm, window):
        outs = feed(data[i:i + window])
    import jax
    jax.block_until_ready(outs.pose6)

    iters = []
    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench, window):
        outs = feed(data[i:i + window])
        iters.append(outs.s2m_iterations)
    jax.block_until_ready(outs.pose6)
    wall = time.perf_counter() - t0
    lio.flush()
    iters = [int(i) for i in np.concatenate([np.asarray(x) for x in iters])]

    scans_per_sec = n_bench / wall
    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    err = float(np.linalg.norm(est - gt, axis=1).max())

    result = {
        "metric": "lio_odometry_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 2),
        "extra": {
            "ms_per_scan": round(1000.0 * wall / n_bench, 2),
            "mean_s2m_iters": round(sum(iters) / max(len(iters), 1), 1),
            "max_s2m_iters": max(iters) if iters else 0,
            "max_traj_err_m": round(err, 4),
            "scan_size": f"{n_scan}x{horizon}",
            "window": window,
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
