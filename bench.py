"""Benchmark: LIO odometry throughput on the default (TPU) backend.

Prints ONE JSON line:
  {"metric": "lio_odometry_scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": N / 6.67}

Baseline: the reference LIO-SAM's by-design mapping-rate ceiling of
~6.67 Hz (mappingProcessInterval = 0.15 s on 4 CPU cores,
``liosam_ws/src/LIO-SAM/config/params.yaml:72-73``) — see BASELINE.md.

Two phases, both on VLP-16-sized scans (16 x 1800) from the synthetic world:

1. Odometry (primary metric): 80 scans steady-state after warm-up,
   host->device transfer included.  The trajectory error is GATED: the
   bench fails (nonzero exit, after printing its JSON) if max drift
   exceeds the accuracy budget — perf work can never silently trade
   accuracy again (round-2 VERDICT #2).
2. Loop closure on (round-2 VERDICT #3/#4): a revisiting drive long enough
   to open the 30 s loop-age gate, loop program dispatched at its natural
   1 Hz rate; reports scans/s with loops on + loops closed.  Loop
   enablement is canonicalized out of the jit key (pipeline.py), so this
   phase reuses phase 1's compiled programs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 6.67
ERR_GATE_M = float(os.environ.get("MSST_BENCH_ERR_GATE", "0.10"))


def _dicts(batch):
    # ranges/azimuth/col_time/elev select the range-image upload path
    # (~3.9x fewer serialized transfer bytes; mapping.odometry_window_flat_ri)
    keys = ("xyz", "ring", "time_rel", "scan_start", "imu_t", "imu_gyro",
            "imu_acc", "imu_rpy", "ranges", "azimuth", "col_time", "elev")
    return [{k: s[k] for k in keys} for s in batch]


def _feed(lio, batch):
    return lio.process_window(_dicts(batch))


def data_window(data, i, window):
    return _dicts(data[i:i + window])


def _traj_err(lio, data):
    gt0 = data[0]["gt_pose"][:3, 3]
    gt = np.stack([s["gt_pose"][:3, 3] - gt0 for s in data])
    est = lio.trajectory.as_matrices()[:, :3, 3]
    n = min(len(est), len(gt))
    return float(np.linalg.norm(est[:n] - gt[:n], axis=1).max())


def main():
    import jax

    from msst_tpu.models.liosam import LioSam
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.utils import sim

    n_scan, horizon = 16, 1800
    # window=64 measured best end-to-end once the range-image upload cut
    # transfer bytes 3.9x: the fixed dispatch+transfer overhead amortizes to
    # ~1.2 ms/scan and the vmapped prepare lowers slightly better too
    # (W=16: 86.9 scans/s; W=32: 8.79 ms/scan full / 6.44 execute; W=64:
    # 7.32 full / 6.12 execute — window probes, docs/DESIGN.md round 3)
    window = int(os.environ.get("MSST_BENCH_WINDOW", "64"))

    def params(loop):
        return LioParams(
            n_scan=n_scan, horizon_scan=horizon,
            max_points=n_scan * horizon + 64,
            loop_closure_enabled=loop,
            max_keyframes=256,
        )

    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)

    # --- phase 1: odometry-only throughput (primary metric)
    # n_bench must be a MULTIPLE of the window: a partial window computes
    # all W slots but only its valid prefix counts, so 80 scans at W=32
    # (2.5 windows) inflated ms/scan ~17% (r3 measured phase 1 slower than
    # the longer loop-ON phase for exactly this reason)
    n_warm, n_bench = window, 3 * window  # warm-up = one full window
    data = sim.make_dataset(world, traj, n_scans=n_warm + n_bench,
                            scan_dt=0.1, n_scan=n_scan, horizon=horizon,
                            seed=7)
    lio = LioSam(params(loop=False), window=window)
    for i in range(0, n_warm, window):
        outs = _feed(lio, data[i:i + window])
    jax.block_until_ready(outs.pose6)

    # async feed: each window packs on the main thread while the previous
    # window's dispatch (fixed ~25-35 ms tunnel cost) runs on the worker
    futs = []
    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench, window):
        futs.append(lio.process_window_async(data_window(data, i, window)))
    outs = futs[-1].result()
    jax.block_until_ready(outs.pose6)
    wall = time.perf_counter() - t0
    lio.flush()
    iters = [f.result().s2m_iterations for f in futs]
    iters = [int(i) for i in np.concatenate([np.asarray(x) for x in iters])]
    scans_per_sec = n_bench / wall
    err = _traj_err(lio, data)

    # --- phase 2: loop closure ON over a revisiting drive (the reference's
    # 6.67 Hz ceiling runs WITH its loop thread, mapOptmization.cpp:1770)
    n_loop_scans = 340  # 34 s at 10 Hz: crosses the 30 s loop-age gate
    data2 = sim.make_dataset(world, traj, n_scans=n_loop_scans, scan_dt=0.1,
                             n_scan=n_scan, horizon=horizon, seed=8)
    lio2 = LioSam(params(loop=True), window=window)
    outs2 = _feed(lio2, data2[:window])           # warm (programs cached)
    jax.block_until_ready(outs2.pose6)
    # warm the LOOP program too — its first dispatch would otherwise
    # compile inside the timed region (measured: 6.9 scans/s with the
    # compile in-timing vs the real steady state).  Call the jitted program
    # directly: _try_loop_closure's host pre-gate (age-exact) correctly
    # skips dispatch on a young session, which silently skipped this warm-up
    # and put the compile back in-timing (r3 bench measured 1.81 scans/s).
    from msst_tpu.models.liosam.loop import loop_closure_step
    lio2.state, _ = loop_closure_step(lio2.state, lio2.p)
    lio2.flush()
    # warm the loop-flag flush path too (the padded founds stack + its
    # device_get are compiled programs; a False flag is semantically inert)
    import jax.numpy as jnp
    lio2._pending_loops.append(jnp.zeros((), bool))
    lio2.flush()
    lio2.timings.clear()
    t0 = time.perf_counter()
    for i in range(window, n_loop_scans, window):
        lio2.process_window_async(data_window(data2, i, window))
    lio2.flush()
    wall2 = time.perf_counter() - t0
    loop_timings = {k: round(v, 3) for k, v in lio2.timings.items()}
    loops = int(lio2.state.n_loop)
    loop_scans_per_sec = (n_loop_scans - window) / wall2
    err2 = _traj_err(lio2, data2)

    # --- phase 3: pose-graph LM ms/iter (BASELINE.md tracked metric) on the
    # REAL graph phase 2 built (priors + odometry chain + any loop factors).
    # Chained-in-jit: two compiles of the same program at iters=1 and
    # iters=9; the slope is the per-relinearize-and-solve cost.
    from msst_tpu.ops import graph as graph_ops
    g = lio2.state.graph
    jax.block_until_ready(graph_ops.optimize(g, iters=1).poses.t)
    t0 = time.perf_counter()
    jax.block_until_ready(graph_ops.optimize(g, iters=1).poses.t)
    w1 = time.perf_counter() - t0
    jax.block_until_ready(graph_ops.optimize(g, iters=9).poses.t)  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(graph_ops.optimize(g, iters=9).poses.t)
    w9 = time.perf_counter() - t0
    graph_ms_per_iter = 1000.0 * (w9 - w1) / 8.0

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
            "err_gate_m": ERR_GATE_M,
            "scan_size": f"{n_scan}x{horizon}",
            "window": window,
            "backend": jax.devices()[0].platform,
            "graph_lm_ms_per_iter": round(graph_ms_per_iter, 3),
            "graph_keyframes": int(lio2.state.kf.count),
            "loop_on": {
                "scans_per_sec": round(loop_scans_per_sec, 2),
                "vs_baseline": round(
                    loop_scans_per_sec / BASELINE_SCANS_PER_SEC, 2),
                "loops_closed": loops,
                "scans": n_loop_scans,
                "max_traj_err_m": round(err2, 4),
                "host_stage_s": loop_timings,
            },
        },
    }
    print(json.dumps(result))
    if err > ERR_GATE_M:
        sys.exit(f"ACCURACY GATE FAILED: max_traj_err {err:.4f} m > "
                 f"{ERR_GATE_M} m — perf must not trade accuracy "
                 f"(VERDICT r2 #2)")


if __name__ == "__main__":
    main()
