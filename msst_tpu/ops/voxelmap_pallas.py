"""Pallas TPU kernel for the voxel-feature-map lookup — the scan-to-map hot
spot (measured ~8.5 ms/GN-iteration at 16x1800 through XLA, docs/DESIGN.md).

The packed stats table + hash buckets are small (16k voxels x 12 f32 = 768 kB
+ 2 x 32k i32 buckets = 256 kB), so the whole map pins in VMEM and query
tiles stream over it: the (Q, 8C) candidate row gather never touches HBM,
and the probe/match/argmin pipeline fuses into one kernel instead of a
gather + elementwise chain through HBM.

Same contract as :func:`msst_tpu.ops.voxelmap.lookup` (used behind
``LioParams.use_pallas``; parity-tested in interpret mode, compiled by
Mosaic on TPU).  Replaces the reference's per-iteration
``pcl::KdTreeFLANN`` 5-NN searches (``mapOptmization.cpp:993,1089``) at the
voxel-feature level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .voxelmap import VoxelFeatureMap, VoxelLookup

Array = jax.Array

_P1, _P2, _P3 = 73856093, 19349663, 83492791


def _lookup_kernel(scalars_ref, q_ref, qm_ref, stats_ref, bstart_ref,
                   bcount_ref, out_row_ref, out_d2_ref, out_idx_ref,
                   *, C, table_size, capacity):
    leaf = scalars_ref[0]
    origin = jnp.stack([scalars_ref[1], scalars_ref[2], scalars_ref[3]])
    q = q_ref[:]                                        # (T, 3)
    T = q.shape[0]

    g = (q - origin[None, :]) / leaf
    base = jnp.floor(g).astype(jnp.int32)
    frac = g - base
    step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)

    # 8 octant offsets from an iota (no captured constants in kernels)
    oidx = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)[0]
    combos = jnp.stack([(oidx >> 2) & 1, (oidx >> 1) & 1, oidx & 1], axis=-1)
    cells = base[:, None, :] + combos[None, :, :] * step[:, None, :]  # (T,8,3)

    h = (cells[..., 0] * jnp.int32(_P1) ^ cells[..., 1] * jnp.int32(_P2)
         ^ cells[..., 2] * jnp.int32(_P3))
    hb = jnp.abs(h) % jnp.int32(table_size)             # (T, 8)

    start = jnp.take(bstart_ref[:], hb, axis=0)
    count = jnp.take(bcount_ref[:], hb, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    cand = start[..., None] + lane                      # (T, 8, C)
    ok = lane < count[..., None]
    cand = jnp.where(ok, cand, capacity - 1)
    cand_f = cand.reshape(T, 8 * C)
    ok_f = ok.reshape(T, 8 * C)

    stats = stats_ref[:]                                # (V, 12) in VMEM
    cols = [jnp.take(stats[:, j], cand_f, axis=0) for j in range(12)]

    # packed coord-key match (voxelmap._coord_key)
    shifted = cells + 512
    dom = jnp.all((shifted >= 0) & (shifted < 1024), axis=-1)
    expect = (shifted[..., 0] << 20) | (shifted[..., 1] << 10) | shifted[..., 2]
    expect = jnp.where(dom, expect, jnp.int32(2**30))   # (T, 8)
    expect_f = jnp.repeat(expect, C, axis=1)            # (T, 8C)
    keys = jax.lax.bitcast_convert_type(cols[0], jnp.int32)
    match = (keys == expect_f) & ok_f & (cols[8] > 0.5)

    mx, my, mz = cols[1], cols[2], cols[3]
    d2 = ((mx - q[:, 0:1]) ** 2 + (my - q[:, 1:2]) ** 2
          + (mz - q[:, 2:3]) ** 2)
    qm = qm_ref[:]
    d2 = jnp.where(match & qm[:, None], d2, jnp.inf)

    best = jnp.argmin(d2, axis=1)                       # (T,)
    out_d2_ref[:] = jnp.min(d2, axis=1)
    out_idx_ref[:] = jnp.take_along_axis(cand_f, best[:, None], axis=1)[:, 0]
    for j in range(12):
        out_row_ref[:, j] = jnp.take_along_axis(cols[j], best[:, None],
                                                axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("candidates_per_bucket", "tile",
                                             "interpret"))
def lookup_pallas(vmap: VoxelFeatureMap, q_xyz: Array, q_mask: Array,
                  candidates_per_bucket: int = 3, tile: int = 1024,
                  interpret: bool | None = None) -> VoxelLookup:
    """Drop-in Pallas replacement for :func:`voxelmap.lookup`.

    interpret=None resolves by backend: Mosaic on TPU, interpreter elsewhere
    (the interpreter is the CPU-test path, not a performance path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q = q_xyz.shape[0]
    V = vmap.capacity
    H = vmap.table_size
    pad = (-Q) % tile
    qx = jnp.pad(q_xyz, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))
    n_tiles = (Q + pad) // tile

    kernel = functools.partial(_lookup_kernel, C=candidates_per_bucket,
                               table_size=H, capacity=V)
    scalars = jnp.concatenate([jnp.reshape(vmap.leaf, (1,)), vmap.origin])

    row, d2, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # leaf+origin
            pl.BlockSpec((tile, 3), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),               # queries
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),               # query mask
            pl.BlockSpec((V, 12), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),               # stats
            pl.BlockSpec((H,), lambda t: (0,),
                         memory_space=pltpu.VMEM),               # bucket start
            pl.BlockSpec((H,), lambda t: (0,),
                         memory_space=pltpu.VMEM),               # bucket count
        ],
        out_specs=[
            pl.BlockSpec((tile, 12), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q + pad, 12), jnp.float32),
            jax.ShapeDtypeStruct((Q + pad,), jnp.float32),
            jax.ShapeDtypeStruct((Q + pad,), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, qx, qm, vmap.stats, vmap.bucket_start, vmap.bucket_count)

    row = row[:Q]
    found = jnp.isfinite(d2[:Q])
    return VoxelLookup(
        idx=jnp.clip(idx[:Q], 0, V - 1), found=found,
        mean=row[:, 1:4], direction=row[:, 4:7], d=row[:, 7],
    )
