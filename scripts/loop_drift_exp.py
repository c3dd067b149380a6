"""Loop closure under REAL accumulated drift (round-3 VERDICT #5).

Builds a long multi-revisit drive with deliberately degraded sensing (IMU
bias ramp + extra lidar noise) so open-loop drift exceeds ~1 m, then replays
it twice — loop closure off and on — and reports both error curves.  The
loop-ON run must pull the trajectory back toward ground truth at every
revisit (``performLoopClosure``/``correctPoses``,
``mapOptmization.cpp:529-608,1583-1614``).

Used to calibrate tests/test_liosam.py::test_loop_closure_recovers_large_drift
and as a standing evidence script:

  python scripts/loop_drift_exp.py --scans 500 [--horizon 360] [--loop-only]
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


def run(data, p, window, loop, dump=None):
    from msst_tpu.models.liosam import LioSam

    lio = LioSam(p, window=window)  # pipeline schedules loop attempts itself
    loop_events = []
    n_prev = 0
    for i in range(0, len(data), window):
        batch = data[i:i + window]
        keys = ("xyz", "ring", "time_rel", "scan_start", "imu_t", "imu_gyro",
                "imu_acc", "imu_rpy")
        lio.process_window([{k: s[k] for k in keys} for s in batch])
        if loop:
            lio.flush()
            n_now = int(lio.state.n_loop)
            if n_now > n_prev:
                loop_events.append(i + window)
                n_prev = n_now
    lio.flush()
    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    n = min(len(est), len(gt))
    errs = np.linalg.norm(est[:n] - gt[:n], axis=1)
    # post-optimization keyframe trajectory (the SLAM metric: correctPoses
    # rewrites history, which the causal odometry stream cannot show)
    kf_n = int(lio.state.kf.count)
    kf_pose = np.asarray(lio.state.kf.pose6[:kf_n, 3:])
    kf_time = np.asarray(lio.state.kf.time[:kf_n])
    scan_t = np.asarray([float(s["scan_start"]) for s in data])
    kf_gt = gt[np.searchsorted(scan_t, kf_time - 1e-4).clip(0, len(gt) - 1)]
    kf_errs = np.linalg.norm(kf_pose - kf_gt, axis=1)
    if dump:
        np.savez(dump, errs=errs, est=est[:n], gt=gt[:n],
                 n_kf=int(lio.state.kf.count))
        # coarse curve for eyeballing where divergence starts
        marks = {int(i): round(float(errs[i]), 3)
                 for i in range(0, n, max(n // 16, 1))}
        print(json.dumps({"curve": marks, "n_kf": int(lio.state.kf.count),
                          "loop_events": loop_events}),
              file=sys.stderr)
    return errs, kf_errs, int(lio.state.n_loop)


def build_drive(args):
    from msst_tpu.utils import sim

    if args.world == "dumbbell":
        # out-and-back through the blind corridor: span ~= length - 10 so
        # both pillar zones are entered; scans = one full shuttle period
        world = sim.dumbbell_world(length=args.length)
        span = args.length - 10.0
        period = span * np.pi / args.speed
        traj = sim.SimTrajectory(kind="shuttle", speed=args.speed,
                                 period=period, x0=-20.0, y0=0.0)
        if args.scans <= 0:
            # one full period + re-entry into the corridor: the return-leg
            # loop closure must have scans AFTER it to show its correction
            args.scans = int(period / 0.1) + 160
    else:
        world = sim.World()
        traj = sim.SimTrajectory(kind="circle", radius=args.radius,
                                 speed=args.speed)
    return sim.make_dataset(
        world, traj, n_scans=args.scans, scan_dt=0.1, n_scan=16,
        horizon=args.horizon, seed=args.seed,
        noise=args.lidar_noise,
        imu_noise_gyr=args.gyr_noise, imu_noise_acc=args.acc_noise,
        imu_bias_gyr=args.gyr_bias, imu_bias_acc=args.acc_bias,
        imu_bias_ramp=1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=500,
                    help="<=0 with --world dumbbell: one full shuttle period")
    ap.add_argument("--world", choices=("room", "dumbbell"), default="room")
    ap.add_argument("--length", type=float, default=150.0)
    ap.add_argument("--horizon", type=int, default=900)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--radius", type=float, default=8.0)
    ap.add_argument("--speed", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--lidar-noise", type=float, default=0.03)
    ap.add_argument("--gyr-noise", type=float, default=5e-3)
    ap.add_argument("--acc-noise", type=float, default=5e-2)
    ap.add_argument("--gyr-bias", type=float, default=8e-3)
    ap.add_argument("--acc-bias", type=float, default=5e-2)
    ap.add_argument("--age-gate", type=float, default=8.0)
    ap.add_argument("--loop-only", action="store_true")
    ap.add_argument("--off-only", action="store_true")
    ap.add_argument("--max-keyframes", type=int, default=128)
    ap.add_argument("--dump", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="extra LioParams overrides, key=value (evaluated); "
                    "e.g. --set loop_submap_cap=8192 --set loop_leaf_size=0.8"
                    " — CPU replays need smaller loop ICP shapes than TPU")
    ap.add_argument("--profile", choices=("tiny", "full"), default="full",
                    help="tiny = CPU test caps (diverge after ~15 m on this "
                    "drive regardless of degradation or window — measured "
                    "r4; kept for regression archaeology); full = "
                    "production caps, the profile every committed number "
                    "uses")
    args = ap.parse_args()

    from msst_tpu.models.liosam.params import LioParams, tiny_params

    data = build_drive(args)

    over = {k: eval(v) for k, v in (s.split("=", 1) for s in args.set)}

    def params(loop):
        if args.profile == "tiny":
            return tiny_params(
                loop_closure_enabled=loop,
                history_keyframe_search_time_diff=args.age_gate,
                history_keyframe_search_num=8,
                max_keyframes=args.max_keyframes, **over)
        return LioParams(
            n_scan=16, horizon_scan=args.horizon,
            max_points=16 * args.horizon + 64,
            loop_closure_enabled=loop,
            history_keyframe_search_time_diff=args.age_gate,
            max_keyframes=args.max_keyframes, **over)

    t0 = time.time()
    out = {}
    if not args.loop_only:
        errs_off, kfe_off, _ = run(data, params(False), args.window,
                                   loop=False,
                                   dump=args.dump and args.dump + "_off")
        out["loop_off"] = dict(max_err=round(float(errs_off.max()), 3),
                               final_err=round(float(errs_off[-1]), 3),
                               kf_max_err=round(float(kfe_off.max()), 3))
    if not args.off_only:
        errs_on, kfe_on, n_loops = run(data, params(True), args.window,
                                       loop=True,
                                       dump=args.dump and args.dump + "_on")
        out["loop_on"] = dict(max_err=round(float(errs_on.max()), 3),
                              final_err=round(float(errs_on[-1]), 3),
                              kf_max_err=round(float(kfe_on.max()), 3),
                              kf_final_err=round(float(kfe_on[-1]), 3),
                              loops=n_loops)
    if "loop_off" in out and "loop_on" in out:
        out["ratio_max"] = round(
            out["loop_off"]["max_err"] / max(out["loop_on"]["max_err"], 1e-9),
            2)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
