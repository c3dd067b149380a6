"""Real-Mosaic Pallas benchmark for the voxel-lookup gather (VERDICT r3 #2).

Runs ON THE REAL TPU (serially — single-tenant tunnel) and prints one JSON
line with:

1. mosaic_take_along_axis: does the round-2 take_along_axis kernel
   (ops/voxelmap_pallas.lookup_pallas) compile under the CURRENT Mosaic
   toolchain?  (tests/test_pallas_toolchain.py is the CI watch; this is the
   hardware measurement companion.)
2. xla_probe_gather_ms: the production path — ONE wide embedded-probe row
   gather at the bench lookup shape (H=131072 concat buckets, (Q=10240, 8)
   row indices, 24 f32 per row), measured chained-in-jit (CLAUDE.md rule:
   wall(K reps) - wall(1 rep) / (K-1), data-dependent chaining).
3. pallas_onehot_ms: the one Mosaic-expressible full-gather formulation
   (ops/gather_pallas.onehot_gather_rows, gather-as-MXU-matmul) at the same
   shape, same timing method.
4. pallas_onehot_small_ms / xla_small_ms: the same pair at a small-table
   shape (H=2048) where the MXU pass is arithmetically plausible.

Usage:  python scripts/pallas_bench.py [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(fn, x, reps):
    """Device-time estimate: chain the op K times with data dependence in
    ONE jit and difference the walls (block_until_ready can lie on axon).

    The dependence feeds each iteration's OUTPUT back into the next
    iteration's TABLE via a tiny additive term — a form XLA cannot
    constant-fold or CSE away (a `% 1` index perturbation folds to 0 and
    the whole chain collapses to one gather; measured as negative deltas).
    The final readback returns one scalar so D2H cost is identical for
    every chain length and cancels in the difference."""

    def chain(n):
        @jax.jit
        def run(t):
            for _ in range(n):
                out = fn(t, 0)
                t = t + out[0, :1] * jnp.float32(1e-20)
            return jnp.sum(t[0])
        return run

    r1 = chain(1)
    np.asarray(r1(x))  # compile + run
    t0 = time.perf_counter()
    np.asarray(r1(x))
    w1 = time.perf_counter() - t0
    rk = chain(reps)
    np.asarray(rk(x))
    t0 = time.perf_counter()
    np.asarray(rk(x))
    wk = time.perf_counter() - t0
    return 1000.0 * (wk - w1) / (reps - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--h", type=int, default=131072)
    ap.add_argument("--q", type=int, default=10240)
    args = ap.parse_args()
    out = {"backend": jax.default_backend()}

    # --- 1. Mosaic status of the take_along_axis kernel
    from tests.test_pallas_toolchain import _attempt_lowering
    ok, err = _attempt_lowering()
    out["mosaic_take_along_axis"] = "compiles" if ok else err.splitlines()[0][:160]

    # --- 2/3. production-shape gather: XLA native vs one-hot MXU
    rng = np.random.default_rng(0)
    H, W, Q = args.h, 24, args.q
    table = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, H, size=(Q * 8,)).astype(np.int32))

    def xla_gather(t, j):
        return t[(idx + j) % H]

    # cheap ops need long chains to rise above the ~10-30 ms tunnel noise
    out["xla_probe_gather_ms"] = round(
        chained_ms(xla_gather, table, 64), 3)

    from msst_tpu.ops.gather_pallas import onehot_gather_rows
    try:
        def pallas_gather(t, j):
            return onehot_gather_rows(t, (idx + j) % H)

        out["pallas_onehot_ms"] = round(
            chained_ms(pallas_gather, table, args.reps), 3)
    except Exception as e:  # noqa: BLE001
        out["pallas_onehot_ms"] = f"FAILED: {str(e).splitlines()[0][:160]}"

    # --- 4. small-table shape (H=2048): where the MXU pass could win
    Hs = 2048
    table_s = jnp.asarray(rng.normal(size=(Hs, W)).astype(np.float32))
    idx_s = jnp.asarray(rng.integers(0, Hs, size=(Q,)).astype(np.int32))

    def xla_small(t, j):
        return t[(idx_s + j) % Hs]

    out["xla_small_ms"] = round(chained_ms(xla_small, table_s, 128), 3)
    try:
        def pallas_small(t, j):
            return onehot_gather_rows(t, (idx_s + j) % Hs, h_chunk=512)

        out["pallas_onehot_small_ms"] = round(
            chained_ms(pallas_small, table_s, 32), 3)
    except Exception as e:  # noqa: BLE001
        out["pallas_onehot_small_ms"] = f"FAILED: {str(e).splitlines()[0][:160]}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
