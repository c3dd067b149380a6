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
    ap.add_argument("--chained", action="store_true",
                    help="replay all windows inside ONE jit (lax.fori_loop)."
                    " CAUTION: measured 99 ms/scan vs 16.5 dispatch-level on"
                    " v5e — the outer loop carry forces copies of the 100 MB"
                    " state that donation elides at dispatch boundaries, so"
                    " this OVERSTATES device time for the full step (the"
                    " chained-in-jit rule from CLAUDE.md is for single ops);"
                    " the dispatch-level wall is bounded below by the real"
                    " execution because mid-run readbacks deliver real data")
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

    if args.chained:
        return run_chained(args, p, lio, data, W)

    def _feed(l, batch):
        return l.process_window([
            dict(xyz=s["xyz"], ring=s["ring"], time_rel=s["time_rel"],
                 scan_start=s["scan_start"], imu_t=s["imu_t"],
                 imu_gyro=s["imu_gyro"], imu_acc=s["imu_acc"],
                 imu_rpy=s["imu_rpy"])
            for s in batch
        ])

    for i in range(0, len(data), W):
        outs = _feed(lio, data[i:i + W])   # compile + the accuracy pass
    jax.block_until_ready(outs.pose6)

    # multiple passes IN ONE PROCESS (programs stay compiled): vary the
    # readback cadence to split pipeline stalls from dispatch+device time
    results = {}
    for label, rb in [("normal", None), ("no_readback", 10**9),
                      ("readback_every_window", W)]:
        lio2 = LioSam(p, window=W, readback_interval=rb)
        outs = None
        for i in range(0, n_warm, W):
            outs = _feed(lio2, data[i:i + W])
        jax.block_until_ready(outs.pose6)
        t0 = time.perf_counter()
        for i in range(n_warm, n_warm + args.scans, W):
            outs = _feed(lio2, data[i:i + W])
        jax.block_until_ready(outs.pose6)
        wall = time.perf_counter() - t0
        lio2.flush()
        results[label] = round(1000.0 * wall / args.scans, 2)

    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    lio.flush()
    est = lio.trajectory.as_matrices()[:, :3, 3]
    n = min(len(est), len(gt))
    err = float(np.linalg.norm(est[:n] - gt[:n], axis=1).max())

    print(json.dumps({
        "exp": {"window": W, "quant": not args.no_quant,
                "map_update": args.map_update, "scans": args.scans},
        "ms_per_scan": results,
        "scans_per_sec": round(1000.0 / results["normal"], 2),
        "max_traj_err_m": round(err, 4),
        "backend": jax.devices()[0].platform,
    }))


def run_chained(args, p, lio, data, W):
    """Device-time probe: pack every window on the host, upload ONCE, and
    run the whole drive inside one jitted fori_loop over window slices.
    wall/scans = device ms/scan; bench wall minus this = host+tunnel."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    from msst_tpu.models.liosam.mapping import (odometry_window_flat,
                                                odometry_window_flat_q16)
    from msst_tpu.models.liosam.state import init_state

    quant = p.quantized_upload
    n5 = p.max_points * 5
    a8 = (2 * p.imu_window + 3) * 8
    D = n5 + (2 * a8 if quant else a8)
    n_win = len(data) // W
    dtype = np.int16 if quant else np.float32
    all_flat = np.zeros((n_win, W, D), dtype)
    for w in range(n_win):
        for i, s in enumerate(data[w * W:(w + 1) * W]):
            if quant:
                n_i = lio._pack_points_q16(s["xyz"], s["ring"], s["time_rel"],
                                           all_flat[w, i, :n5])
                aux = lio._make_aux_np(n_i, s["time_rel"], s["scan_start"],
                                       imu_t=s["imu_t"],
                                       imu_gyro=s["imu_gyro"],
                                       imu_acc=s["imu_acc"],
                                       imu_rpy=s["imu_rpy"])
                all_flat[w, i, n5:] = aux.reshape(-1).view(np.int16)
            else:
                pts, aux = lio._make_input_np(
                    s["xyz"], s["ring"], s["time_rel"], s["scan_start"],
                    imu_t=s["imu_t"], imu_gyro=s["imu_gyro"],
                    imu_acc=s["imu_acc"], imu_rpy=s["imu_rpy"])
                all_flat[w, i, :n5] = pts.reshape(-1)
                all_flat[w, i, n5:] = aux.reshape(-1)
            lio._last_scan_time = float(s["scan_start"])

    window_fn = odometry_window_flat_q16 if quant else odometry_window_flat

    @partial(jax.jit, static_argnames=("k0", "k1"))
    def replay(state, flat_all, k0, k1):
        def body(i, st):
            st, _ = window_fn(st, flat_all[i], p)
            return st
        st = jax.lax.fori_loop(k0, k1, body, state)
        return st.pose6

    flat_dev = jnp.asarray(all_flat)
    # warm = same static signature as the measured call (one compile)
    state = init_state(p)
    pose6 = replay(state, flat_dev, 0, n_win)
    jax.block_until_ready(pose6)
    state = init_state(p)
    t0 = time.perf_counter()
    pose6 = replay(state, flat_dev, 0, n_win)
    jax.block_until_ready(pose6)
    wall = time.perf_counter() - t0
    n_scans = n_win * W
    print(json.dumps({
        "exp": {"chained": True, "window": W, "quant": quant,
                "windows": n_win},
        "device_ms_per_scan": round(1000.0 * wall / n_scans, 2),
        "scans": n_scans,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
