"""Pallas TPU kernel for the hash-grid k-NN query.

The XLA formulation in :mod:`msst_tpu.ops.knn` materializes the (Q, 27*C)
candidate gather in HBM on every scan-to-map Gauss-Newton iteration.  The map
arrays are small (the local map caps fit comfortably in VMEM: 49k points x
12 B + bucket tables < 1 MB), so this kernel pins the whole grid in VMEM and
streams query tiles over it — candidate gathers never touch HBM.

Same contract as ``knn.query`` (exactness caveats included).  Selected by
``LioParams.use_pallas`` ("auto" = TPU only) via
``registration.scan_to_map(..., use_pallas=True)``; off-TPU the interpreter
runs it for parity tests (not a performance path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import HashGrid, KnnResult

Array = jax.Array

_P1, _P2, _P3 = 73856093, 19349663, 83492791


def _query_kernel(cell_ref, qx_ref, qm_ref, pts_ref, bstart_ref, bcount_ref,
                  out_d_ref, out_i_ref, *, k, C, table_size, n_points):
    q = qx_ref[:]                                   # (T, 3)
    cell = cell_ref[0]
    qc = jnp.floor(q / cell).astype(jnp.int32)      # (T, 3)

    T = q.shape[0]
    # 27 neighbor cells; offsets built in-kernel from an iota (no captured
    # constants allowed in pallas kernels)
    oidx = jax.lax.broadcasted_iota(jnp.int32, (1, 27), 1)[0]   # (27,)
    offs = jnp.stack([oidx // 9 - 1, (oidx // 3) % 3 - 1, oidx % 3 - 1],
                     axis=-1)                       # (27, 3)
    cells = qc[:, None, :] + offs[None, :, :]       # (T, 27, 3)
    h = (cells[..., 0] * jnp.int32(_P1)
         ^ cells[..., 1] * jnp.int32(_P2)
         ^ cells[..., 2] * jnp.int32(_P3))
    hb = jnp.abs(h) % jnp.int32(table_size)         # (T, 27)

    bstart = bstart_ref[:]                          # (H,)
    bcount = bcount_ref[:]
    start = jnp.take(bstart, hb, axis=0)            # (T, 27)
    count = jnp.take(bcount, hb, axis=0)

    # duplicate-probe suppression
    eq = hb[:, :, None] == hb[:, None, :]
    earlier = jnp.tril(jnp.ones((27, 27), jnp.bool_), k=-1)
    first = ~jnp.any(eq & earlier[None], axis=2)    # (T, 27)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    cand = start[:, :, None] + lane                 # (T, 27, C)
    ok = (lane < count[:, :, None]) & first[:, :, None]
    cand = jnp.where(ok, cand, n_points - 1).reshape(T, 27 * C)
    ok = ok.reshape(T, 27 * C)

    pts = pts_ref[:]                                # (N, 3) in VMEM
    cx = jnp.take(pts[:, 0], cand, axis=0)
    cy = jnp.take(pts[:, 1], cand, axis=0)
    cz = jnp.take(pts[:, 2], cand, axis=0)
    d2 = ((cx - q[:, 0:1]) ** 2 + (cy - q[:, 1:2]) ** 2
          + (cz - q[:, 2:3]) ** 2)
    qm = qm_ref[:]
    d2 = jnp.where(ok & qm[:, None], d2, jnp.inf)

    lanes = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    work = d2
    for j in range(k):
        i = jnp.argmin(work, axis=1)                # (T,)
        v = jnp.min(work, axis=1)
        out_d_ref[:, j] = v
        out_i_ref[:, j] = jnp.take_along_axis(cand, i[:, None], axis=1)[:, 0]
        work = jnp.where(lanes == i[:, None], jnp.inf, work)


@functools.partial(jax.jit, static_argnames=("k", "candidates_per_cell",
                                             "tile", "interpret"))
def query_pallas(grid: HashGrid, q_xyz: Array, q_mask: Array, k: int = 5,
                 candidates_per_cell: int = 16,
                 max_sqdist: float = jnp.inf, tile: int = 512,
                 interpret: bool = False) -> KnnResult:
    Q = q_xyz.shape[0]
    n_points = grid.xyz.shape[0]
    table_size = grid.bucket_start.shape[0]
    pad = (-Q) % tile
    qx = jnp.pad(q_xyz, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))
    n_tiles = (Q + pad) // tile

    kernel = functools.partial(
        _query_kernel, k=k, C=candidates_per_cell,
        table_size=table_size, n_points=n_points)

    d, i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # cell size
            pl.BlockSpec((tile, 3), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),              # queries
            pl.BlockSpec((tile,), lambda t: (t,),
                         memory_space=pltpu.VMEM),              # query mask
            pl.BlockSpec((n_points, 3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),              # map points
            pl.BlockSpec((table_size,), lambda t: (0,),
                         memory_space=pltpu.VMEM),              # bucket start
            pl.BlockSpec((table_size,), lambda t: (0,),
                         memory_space=pltpu.VMEM),              # bucket count
        ],
        out_specs=[
            pl.BlockSpec((tile, k), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q + pad, k), jnp.float32),
            jax.ShapeDtypeStruct((Q + pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.reshape(grid.cell_size, (1,)), qx, qm, grid.xyz,
      grid.bucket_start, grid.bucket_count)

    d = d[:Q]
    i = jnp.clip(i[:Q], 0, n_points - 1)
    valid = jnp.isfinite(d) & (d <= max_sqdist)
    return KnnResult(grid.orig_idx[i], d, valid)
