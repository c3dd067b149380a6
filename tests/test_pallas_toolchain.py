"""Toolchain watch for the parked Pallas kernels (round-2 VERDICT #10).

DESIGN.md records why the VMEM-resident lookup kernels stay off: on the
current toolchain, Mosaic's ``tpu.dynamic_gather`` is a single-vreg lane
shuffle ("Not implemented: Multiple source vregs along gather dimension"),
so a >128-lane table gather is inexpressible.  This test re-ATTEMPTS the
real Mosaic lowering on every toolchain bump so that conclusion cannot go
stale: it is skipped on CPU (the suite's backend), and on a real TPU it
either reproduces the known limitation or FAILS LOUDLY the day Mosaic
grows multi-vreg gathers — the signal to re-benchmark ``use_pallas``.

Run on hardware via:  python scripts/pallas_watch.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _attempt_lowering():
    """(ok, error_message): try to compile + run the voxel lookup kernel
    with Mosaic (interpret=False) on tiny-but-multi-vreg table shapes."""
    from msst_tpu.ops import voxelmap
    from msst_tpu.ops.voxelmap_pallas import lookup_pallas, prepare_tables

    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, size=(2048, 3)).astype(np.float32)
    vmap = voxelmap.build(jnp.asarray(pts), jnp.ones(2048, bool), 1.0,
                          1024, "plane", table_size=2048,
                          origin=jnp.zeros(3, jnp.float32))
    tables = prepare_tables(vmap)
    q = jnp.asarray(rng.uniform(-10, 10, size=(512, 3)).astype(np.float32))
    try:
        out = lookup_pallas(tables, q, jnp.ones(512, bool), interpret=False)
        jax.block_until_ready(out.idx)
        return True, ""
    except Exception as e:  # noqa: BLE001 — record whatever Mosaic raises
        return False, str(e)


def test_onehot_gather_rows_matches_indexing():
    """ops/gather_pallas.onehot_gather_rows == table[idx] (interpret mode on
    CPU; scripts/pallas_bench.py measures the real-Mosaic number — the
    gather-as-MXU-matmul is the one formulation Mosaic can express)."""
    from msst_tpu.ops.gather_pallas import onehot_gather_rows

    rng = np.random.default_rng(1)
    for H, W, N in ((1000, 24, 700), (2048, 8, 2048), (300, 130, 100)):
        table = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, H, size=(N,)).astype(np.int32))
        out = onehot_gather_rows(table, idx, tile=256, h_chunk=512,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table)[np.asarray(idx)])


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic lowering requires a real TPU backend "
                           "(run scripts/pallas_watch.py on hardware)")
def test_mosaic_lowering_status():
    ok, err = _attempt_lowering()
    if ok:
        pytest.fail(
            "Mosaic now compiles the voxel-lookup kernel! The 'multi-vreg "
            "gather inexpressible' conclusion (DESIGN.md, Pallas status) is "
            "stale — re-benchmark LioParams.use_pallas='auto' and update "
            "the default.")
    # the known limitations: r2's clean Mosaic rejection ("Not implemented:
    # Multiple source vregs along gather dimension") or the 2026-08
    # toolchain's harder failure (the tunneled remote compiler subprocess
    # crashes outright on this lowering — scripts/pallas_bench.py r4 run).
    # Anything else is a new failure mode worth a look.
    assert ("gather" in err.lower() or "Not implemented" in err
            or "remote_compile" in err or "tpu_compile_helper" in err), err
