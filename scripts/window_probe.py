"""Window-level wall decomposition for the odometry pipeline (bench shapes).

Separates, at 16x1800 / window=16:
  full     the bench path: process_window_async (pack + upload + dispatch)
  upload   window_fn with a fresh host->device upload per window
  execute  window_fn with PRE-UPLOADED inputs, donated state chained across
           dispatches — the device execution floor of the window program

Methodology: each phase feeds N windows back-to-back and ends with ONE real
D2H of computed data (a pose element), the trustworthy sync on axon
(CLAUDE.md: bare block_until_ready can return early; chained-in-jit replay
is invalid for the big donated state).  Differences between phases isolate
the upload and host-pack/dispatch costs.

Run with the host otherwise IDLE (memory: bench-needs-idle-host).
Usage: python scripts/window_probe.py [--windows 8] [--cpu]
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
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--window-size", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-upload", action="store_true",
                    help="skip the per-window fresh-upload phase (its "
                         "synchronous jnp.asarray dispatches measured "
                         "pathologically slow through the tunnel — the "
                         "full/execute phases bracket the answer)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.models.liosam.pipeline import LioSam
    from msst_tpu.utils import sim

    n_scan, horizon, window = 16, 1800, args.window_size
    p = LioParams(n_scan=n_scan, horizon_scan=horizon,
                  max_points=n_scan * horizon + 64,
                  loop_closure_enabled=False, max_keyframes=256)
    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    N = args.windows
    data = sim.make_dataset(world, traj, n_scans=(2 * N + 2) * window,
                            scan_dt=0.1, n_scan=n_scan, horizon=horizon,
                            seed=7)

    def dicts(batch):
        # includes the grid fields so the pipeline auto-selects the
        # range-image upload path, like bench.py (the production default)
        keys = ("xyz", "ring", "time_rel", "scan_start", "imu_t", "imu_gyro",
                "imu_acc", "imu_rpy", "ranges", "azimuth", "col_time", "elev")
        return [{k: s[k] for k in keys} for s in batch]

    lio = LioSam(p, window=window)
    # warm-up: boot window (dynamic init) + one more window
    for i in range(0, 2 * window, window):
        outs = lio.process_window(dicts(data[i:i + window]))
    _ = float(np.asarray(outs.pose6).reshape(-1)[-1])

    def sync(outs):
        return float(np.asarray(outs.pose6).reshape(-1)[-1])

    results = {}

    # --- phase FULL: the bench path
    t0 = time.perf_counter()
    fut = None
    for i in range(2 * window, (N + 2) * window, window):
        fut = lio.process_window_async(dicts(data[i:i + window]))
    sync(fut.result())
    results["full_ms_per_window"] = 1000.0 * (time.perf_counter() - t0) / N

    # pre-pack the next N windows (reuses the pipeline's packer; counters
    # advance but the pipeline is not used after this)
    lio._join_dispatch()
    packed = []
    for i in range((N + 2) * window, (2 * N + 2) * window, window):
        flat_w, _, _ = lio._pack_window(dicts(data[i:i + window]))
        packed.append(flat_w)
    from msst_tpu.models.liosam.mapping import select_window_fn
    window_fn = select_window_fn(lio.p, packed[0])

    # --- phase UPLOAD: fresh upload per window, dispatches chained
    state = lio.state  # direct window_fn calls donate these buffers
    if not args.skip_upload:
        t0 = time.perf_counter()
        for w in packed:
            state, outs = window_fn(state, jnp.asarray(w), lio.p)
        sync(outs)
        results["upload_ms_per_window"] = (1000.0
                                           * (time.perf_counter() - t0) / N)

    # --- phase EXECUTE: inputs pre-staged on device
    staged = [jax.device_put(w) for w in packed]
    jax.block_until_ready(staged)
    t0 = time.perf_counter()
    for f in staged:
        state, outs = window_fn(state, f, lio.p)
    sync(outs)
    results["execute_ms_per_window"] = 1000.0 * (time.perf_counter() - t0) / N

    for k in list(results):
        results[k] = round(results[k], 2)
    results["ms_per_scan"] = {k.split("_")[0]: round(v / window, 2)
                              for k, v in results.items()}
    results["windows"] = N
    results["backend"] = jax.devices()[0].platform
    print(json.dumps(results))


if __name__ == "__main__":
    main()
