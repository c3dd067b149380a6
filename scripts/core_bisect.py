"""Bisect the window program's execute floor by compiling stubbed variants.

The round-3 window probe (W=32) measured a 6.44 ms/scan execute floor, but
the per-stage probes (stage_probe.py) only account for ~3.2 ms/scan
(prepare ~1.35 + s2m 1.08 + amortized kf_update ~0.74).  The gap lives in
the sequential core (``mapping.odometry_core`` under ``lax.scan``) — ESKF
math, conds, carry traffic — which the chained-in-jit methodology cannot
probe (the ~100 MB state carry forces copies donation elides at dispatch
boundaries; docs/DESIGN.md round-3 notes).

Method: compile the REAL window program (odometry_window_flat_ri) several
times with module-level stubs swapped in, and measure each variant on
pre-staged inputs with donated state chained across dispatches (the same
"execute" methodology as window_probe.py).  Differences between variants
are in-situ stage costs, including everything the compiler does around
them:

  full        the production program
  pass        odometry_core -> state passthrough.  NOTE: XLA then dead-code
              eliminates the entire vmapped prepare (its outputs feed only
              the core), so this is the unpack + carry/dispatch floor, NOT
              prepare (CPU smoke: compile 2.5 s vs 77 s full).
  no_s2m      registration.scan_to_map_voxel -> initial guess: full minus
              in-situ scan-to-map
  no_insert   _insert_keyframe -> pose-only update: full minus the whole
              keyframe path (kf_update + graph append + local-map merge)
  no_both     both stubs: prepare + ESKF/integration floor.  full - no_both
              = combined in-situ s2m + keyframe path; no_both - pass =
              prepare + ESKF (in situ, with only their true consumers)

Each variant is a fresh ~10 min remote compile; run serially, host idle.
Usage: python scripts/core_bisect.py [--windows 6] [--window-size 32]
       [--variants full,pass,no_s2m,no_insert]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--window-size", type=int, default=32)
    ap.add_argument("--variants", default="full,pass,no_s2m,no_insert,no_both")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--horizon", type=int, default=1800,
                    help="shrink for CPU smoke tests of the probe itself")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import msst_tpu.models.liosam.mapping as M
    from msst_tpu.models.liosam.params import LioParams
    from msst_tpu.models.liosam.pipeline import LioSam
    from msst_tpu.ops import registration as R
    from msst_tpu.utils import sim

    n_scan, horizon, window = 16, args.horizon, args.window_size
    p = LioParams(n_scan=n_scan, horizon_scan=horizon,
                  max_points=n_scan * horizon + 64,
                  loop_closure_enabled=False, max_keyframes=256)
    world = sim.World()
    traj = sim.SimTrajectory(kind="circle", radius=10.0, speed=2.0)
    N = args.windows
    data = sim.make_dataset(world, traj, n_scans=(N + 3) * window,
                            scan_dt=0.1, n_scan=n_scan, horizon=horizon,
                            seed=7)

    def dicts(batch):
        keys = ("xyz", "ring", "time_rel", "scan_start", "imu_t", "imu_gyro",
                "imu_acc", "imu_rpy", "ranges", "azimuth", "col_time", "elev")
        return [{k: s[k] for k in keys} for s in batch]

    lio = LioSam(p, window=window)
    for i in range(0, 2 * window, window):        # boot + one steady window
        outs = lio.process_window(dicts(data[i:i + window]))
    _ = float(np.asarray(outs.pose6).reshape(-1)[-1])
    lio._join_dispatch()

    # pre-pack + pre-stage the probe windows (one extra for variant warm-up)
    packed = []
    for i in range(2 * window, (N + 3) * window, window):
        flat_w, _, _ = lio._pack_window(dicts(data[i:i + window]))
        packed.append(flat_w)
    staged = [jax.device_put(w) for w in packed]
    jax.block_until_ready(staged)
    from msst_tpu.models.liosam.mapping import (odometry_window_flat_ri,
                                                odometry_window_flat_ri2,
                                                select_window_fn)
    window_fn = select_window_fn(lio.p, packed[0])
    assert window_fn in (odometry_window_flat_ri, odometry_window_flat_ri2), \
        "probe expects a range-image upload path (bench default)"

    state0 = lio.state

    orig_core = M.odometry_core
    orig_s2m = R.scan_to_map_voxel
    orig_insert = M._insert_keyframe

    def s2m_stub(cx, cm, sx, sm, cvox, svox, init6, **kw):
        return types.SimpleNamespace(
            pose=init6, degenerate=jnp.asarray(False),
            iterations=jnp.asarray(0, jnp.int32))

    def insert_stub(s, pose6, st, c, su, ps, pp):
        return s._replace(pose6=pose6)

    last = ["full"]  # warm-up compiled the production program

    def set_variant(name):
        if name == last[0]:
            return
        last[0] = name
        M.odometry_core = orig_core
        R.scan_to_map_voxel = orig_s2m
        M._insert_keyframe = orig_insert
        if name == "pass":
            M.odometry_core = lambda s, ps, pp: (s, M._passthrough_output(s))
        elif name == "no_s2m":
            R.scan_to_map_voxel = s2m_stub
        elif name == "no_insert":
            M._insert_keyframe = insert_stub
        elif name == "no_both":
            R.scan_to_map_voxel = s2m_stub
            M._insert_keyframe = insert_stub
        elif name != "full":
            raise SystemExit(f"unknown variant {name}")
        # the stubs are reached through the INNER jitted
        # odometry_window_packed; clearing only window_fn's cache would reuse
        # its cached jaxpr and silently measure the unstubbed program.  Skipped
        # when the variant is unchanged (lets the "full" run reuse the
        # warm-up's ~10 min remote compile).
        jax.clear_caches()

    def sync(outs):
        return float(np.asarray(outs.pose6).reshape(-1)[-1])

    results = {}
    for name in args.variants.split(","):
        set_variant(name)
        state = jax.tree_util.tree_map(jnp.copy, state0)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        state, outs = window_fn(state, staged[0], lio.p)   # compile + warm
        sync(outs)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for f in staged[1:]:
            state, outs = window_fn(state, f, lio.p)
        sync(outs)
        ms = 1000.0 * (time.perf_counter() - t0) / N
        results[name] = {"execute_ms_per_window": round(ms, 2),
                         "ms_per_scan": round(ms / window, 3),
                         "compile_s": round(compile_s, 1)}
        print(f"  {name}: {results[name]}", file=sys.stderr)

    set_variant("full")
    print(json.dumps({"variants": results, "windows": N, "window": window,
                      "backend": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
