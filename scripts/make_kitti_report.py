"""Generate the committed KITTI-protocol accuracy report.

Builds a benchmark-scale KITTI raw drive directory (velodyne_points/*.bin +
oxts/*.txt in the exact layout ``kitti2bag.py:28-61`` consumes) from the
simulator, replays it through the REAL ``msst lio-kitti`` CLI path
(KittiRawDrive reader -> LioSam -> trajectory export), and evaluates with
the KITTI odometry protocol (utils/kitti_eval).

This environment has no network egress, so the canonical
``2011_09_30_drive_0028`` segment cannot be fetched; the report states this
and records the exact command to reproduce the numbers on real data:

    msst lio-kitti <extracted_drive_dir> --rings 64 --output traj.txt

Usage:  python scripts/make_kitti_report.py [--scans 400] [--out reports/]
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_drive(out_dir: str, n_scans: int, n_scan: int, horizon: int,
                seed: int = 7):
    from scipy.spatial.transform import Rotation as Rs

    from msst_tpu.utils import sim

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=25.0, speed=5.0)
    data = sim.make_dataset(world, traj, n_scans=n_scans, scan_dt=0.1,
                            n_scan=n_scan, horizon=horizon, seed=seed)

    d = os.path.join(out_dir, "2026_01_01", "2026_01_01_drive_0001_sync")
    os.makedirs(os.path.join(d, "velodyne_points", "data"), exist_ok=True)
    os.makedirs(os.path.join(d, "oxts", "data"), exist_ok=True)

    def fmt_ts(t):
        base = datetime.datetime(2026, 1, 1, 12, 0, 0)
        dt = base + datetime.timedelta(seconds=float(t))
        return f"{dt.strftime('%Y-%m-%d %H:%M:%S')}.{dt.microsecond:06d}000"

    velo_ts = []
    for i, s in enumerate(data):
        pts = np.concatenate(
            [s["xyz"], np.ones((len(s["xyz"]), 1), np.float32)], axis=1)
        pts.astype(np.float32).tofile(
            os.path.join(d, "velodyne_points", "data", f"{i:010d}.bin"))
        velo_ts.append(fmt_ts(s["scan_start"]))
    with open(os.path.join(d, "velodyne_points", "timestamps.txt"), "w") as f:
        f.write("\n".join(velo_ts) + "\n")

    # OXTS at IMU rate with the simulator's true attitude/gyro/acc
    lat0, lon0, alt0 = 48.0, 11.0, 500.0
    re = 6378137.0
    t_all, g_all, a_all = [], [], []
    for s in data:
        for k in range(len(s["imu_t"])):
            t = float(s["imu_t"][k])
            if t_all and t <= t_all[-1]:
                continue
            t_all.append(t)
            g_all.append(np.asarray(s["imu_gyro"][k]))
            a_all.append(np.asarray(s["imu_acc"][k]))

    oxts_ts = []
    for k, t in enumerate(t_all):
        T = traj.pose(t)
        rpy = Rs.from_matrix(T[:3, :3]).as_euler("xyz")
        lat = lat0 + T[1, 3] / re * 180 / np.pi
        lon = lon0 + T[0, 3] / (re * np.cos(np.radians(lat0))) * 180 / np.pi
        row = [lat, lon, alt0 + T[2, 3], *rpy]
        row += [0.0] * 5                              # vn..vu
        row += [*a_all[k], 0.0, 0.0, 0.0]             # ax..au
        row += [*g_all[k], 0.0, 0.0, 0.0]             # wx..wu
        row += [0.02, 0.02, 4.0, 11.0, 0.0, 0.0]
        np.savetxt(os.path.join(d, "oxts", "data", f"{k:010d}.txt"),
                   np.asarray(row)[None], fmt="%.9f")
        oxts_ts.append(fmt_ts(t))
    with open(os.path.join(d, "oxts", "timestamps.txt"), "w") as f:
        f.write("\n".join(oxts_ts) + "\n")

    gt = np.stack([traj.pose(float(s["scan_start"])) for s in data])
    return d, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=400)
    ap.add_argument("--horizon", type=int, default=900)
    ap.add_argument("--out", default=os.path.join(REPO, "reports"))
    ap.add_argument("--workdir", default="/tmp/kitti_synth")
    args = ap.parse_args()

    drive, gt = build_drive(args.workdir, args.scans, 16, args.horizon)
    traj_file = os.path.join(args.workdir, "traj.txt")

    import time
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "msst_tpu.cli", "lio-kitti", drive,
         "--rings", "16", "--tiny", "--output", traj_file],
        capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    if r.returncode != 0:
        sys.exit(f"lio-kitti failed:\n{r.stderr[-3000:]}")
    print(r.stdout)

    est_12 = np.loadtxt(traj_file)
    est = np.tile(np.eye(4), (len(est_12), 1, 1))
    est[:, :3, :] = est_12.reshape(-1, 3, 4)

    # shift GT into the odometry frame (starts at origin)
    gt_shift = gt.copy()
    gt_shift[:, :3, 3] -= gt[0, :3, 3]

    from msst_tpu.utils import kitti_eval as KE
    n = min(len(est), len(gt_shift))
    ate = KE.ate_rmse(est[:n], gt_shift[:n])
    seg = KE.kitti_summary(est[:n], gt_shift[:n])
    rel = KE.rpe(est[:n], gt_shift[:n], delta=10)
    path_len = float(np.sum(np.linalg.norm(
        np.diff(gt_shift[:n, :3, 3], axis=0), axis=1)))

    os.makedirs(args.out, exist_ok=True)
    report = os.path.join(args.out, "KITTI_REPORT.md")
    with open(report, "w") as f:
        f.write(f"""# KITTI-protocol accuracy report

Generated by `python scripts/make_kitti_report.py --scans {args.scans}`
(deterministic; sim seed 7).

## Setup

- Drive: synthetic KITTI raw layout (velodyne_points/*.bin + oxts/*.txt,
  the exact structure `kitti2bag.py:28-61` consumes), {args.scans} scans @
  10 Hz, VLP-16 geometry 16x{args.horizon}, 500 Hz IMU, circle r=25 m @
  5 m/s through the walled simulator world ({path_len:.0f} m path).
- Pipeline: the real `msst lio-kitti` CLI (KittiRawDrive reader -> LioSam ->
  KITTI-format trajectory export), wall time {wall:.0f} s end to end.

## Results (vs simulator ground truth)

| Metric | Value |
|---|---|
| ATE RMSE (Umeyama-aligned) | {ate:.3f} m |
| KITTI t_rel (100-800 m segments) | {seg['t_err_pct']:.3f} % |
| KITTI r_rel | {seg['r_err_deg_per_m'] * 1000:.4f} deg/100m |
| RPE trans RMSE (1 s) | {rel['rpe_trans_rmse_m']:.3f} m |
| RPE rot RMSE (1 s) | {rel['rpe_rot_rmse_deg']:.3f} deg |
| segments evaluated | {seg['n_segments']} |

## Real-data status

This build environment has **no network egress**, so the canonical KITTI
raw segment (`2011_09_30_drive_0028`, the reference's own test recipe,
`liosam_ws/src/LIO-SAM/README.md:175-181`) cannot be fetched, and no real
driving data exists on this machine (verified by search). The full path is
exercised above on KITTI-format data; to reproduce on real data:

```
# extract a KITTI raw *_sync drive, then:
msst lio-kitti /path/to/2011_09_30/2011_09_30_drive_0028_sync \\
    --rings 64 --horizon 1800 --output traj.txt
```

The CLI prints the same ATE / KITTI-segment metrics against the OXTS ground
truth automatically (`cli.py cmd_lio_kitti`), making the BASELINE "ATE
within 1% of LIO-SAM" target directly measurable the moment the data is
available.
""")
    print(f"ATE {ate:.3f} m | t_rel {seg['t_err_pct']:.3f}% -> {report}")


if __name__ == "__main__":
    main()
