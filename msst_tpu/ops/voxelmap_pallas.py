"""Pallas TPU kernel for the voxel-feature-map lookup — the scan-to-map hot
spot (the per-GN-iteration correspondence search, docs/DESIGN.md).

Replaces the reference's per-iteration ``pcl::KdTreeFLANN`` 5-NN searches
(``mapOptmization.cpp:993,1089``) at the voxel-feature level with a
VMEM-resident probe: the packed stats table is small (16k voxels x 12 f32 =
768 kB), so it pins in VMEM and query tiles stream over it — the candidate
row gather never touches HBM.

Mosaic (jax 0.9) lowers exactly one gather pattern: same-shape 2-D
``take_along_axis`` (``tpu.dynamic_gather`` with the batched dim matching).
The kernel is therefore laid out around ONE (12, V)-shaped gather:

* the stats table is transposed to (12, V) and padded so ``24*tile <= V``;
* the 24 candidate slots per query (8 octants x C bucket lanes, computed by
  XLA outside the kernel — tiny (Q, 8) gathers from the bucket tables) are
  broadcast into a (12, V) index matrix whose column ``k*tile + t`` holds
  candidate k of query t;
* ``take_along_axis(statsT, idx, axis=1)`` fetches every candidate row in
  one shot, and the match/distance/argmin reduction walks the 24 candidate
  blocks as static slices — no reshapes, no further gathers.

Same contract as :func:`msst_tpu.ops.voxelmap.lookup` (selected by
``LioParams.use_pallas``; parity-tested in interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .voxelmap import VoxelFeatureMap, VoxelLookup, _coord_key, _hash3

Array = jax.Array

_SENTINEL_KEY = jnp.int32(2**30)


class PallasTables(NamedTuple):
    """Kernel-ready layout of a :class:`VoxelFeatureMap` — compute ONCE per
    local-map rebuild (or at least outside the GN ``while_loop``) so the
    transpose/pad doesn't repeat per iteration."""

    stats_t: Array       # (12, Vp) f32; column Vp-1 is a sentinel row
    bucket_start: Array  # (H,)
    bucket_count: Array  # (H,)
    leaf: Array          # ()
    origin: Array        # (3,)
    capacity: int        # original V (for idx clipping)


def prepare_tables(vmap: VoxelFeatureMap, tile: int = 512,
                   candidates_per_bucket: int = 3) -> PallasTables:
    V = vmap.capacity
    need = max(V + 1, 8 * candidates_per_bucket * tile)
    Vp = -(-need // 128) * 128
    pad_key = jax.lax.bitcast_convert_type(_SENTINEL_KEY, jnp.float32)
    pad_rows = jnp.zeros((Vp - V, 12), jnp.float32).at[:, 0].set(pad_key)
    stats_p = jnp.concatenate([vmap.stats, pad_rows], axis=0)
    return PallasTables(
        stats_t=stats_p.T,
        bucket_start=vmap.bucket_start,
        bucket_count=vmap.bucket_count,
        leaf=vmap.leaf, origin=vmap.origin, capacity=V,
    )


def _lookup_kernel(stats_ref, cand_ref, expect_ref, q_ref,
                   out_row_ref, out_d2_ref, out_idx_ref, *, n_cand, tile):
    statsT = stats_ref[:]                               # (12, Vp)
    Vp = statsT.shape[1]
    cand = cand_ref[:]                                  # (24, T)
    expect = expect_ref[:]                              # (24, T)
    q = q_ref[:]                                        # (3, T)

    # ONE same-shape gather for every candidate row: idx[:, k*T + t] is
    # candidate k of query t, broadcast down the 12 stat rows.  Built from
    # static concatenation — Mosaic has no dynamic_update_slice.
    blocks = [jnp.broadcast_to(cand[k:k + 1, :], (12, tile))
              for k in range(n_cand)]
    if Vp > n_cand * tile:
        blocks.append(jnp.zeros((12, Vp - n_cand * tile), jnp.int32))
    idx = jnp.concatenate(blocks, axis=1)               # (12, Vp)
    rows = jnp.take_along_axis(statsT, idx, axis=1)     # (12, Vp)

    inf = jnp.float32(jnp.inf)
    best_d2 = jnp.full((1, tile), inf, jnp.float32)
    best_row = jnp.zeros((12, tile), jnp.float32)
    best_idx = jnp.zeros((1, tile), jnp.int32)
    for k in range(n_cand):
        blk = rows[:, k * tile:(k + 1) * tile]          # static slice
        key = jax.lax.bitcast_convert_type(blk[0:1, :], jnp.int32)
        match = (key == expect[k:k + 1, :]) & (blk[8:9, :] > 0.5)
        d2 = ((blk[1:2, :] - q[0:1, :]) ** 2
              + (blk[2:3, :] - q[1:2, :]) ** 2
              + (blk[3:4, :] - q[2:3, :]) ** 2)
        d2 = jnp.where(match, d2, inf)
        upd = d2 < best_d2
        best_d2 = jnp.where(upd, d2, best_d2)
        best_row = jnp.where(upd, blk, best_row)
        best_idx = jnp.where(upd, cand[k:k + 1, :], best_idx)

    out_row_ref[:] = best_row
    out_d2_ref[:] = best_d2
    out_idx_ref[:] = best_idx


@functools.partial(jax.jit, static_argnames=("candidates_per_bucket", "tile",
                                             "interpret"))
def lookup_pallas(tables: PallasTables | VoxelFeatureMap, q_xyz: Array,
                  q_mask: Array, candidates_per_bucket: int = 3,
                  tile: int = 512, interpret: bool | None = None
                  ) -> VoxelLookup:
    """Drop-in Pallas replacement for :func:`voxelmap.lookup`.

    Accepts either a raw :class:`VoxelFeatureMap` (tables prepared inline —
    convenient, but repeats the transpose when called in a loop) or a
    :class:`PallasTables` from :func:`prepare_tables`.

    interpret=None resolves by backend: Mosaic on TPU, interpreter elsewhere
    (the interpreter is the CPU-test path, not a performance path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(tables, VoxelFeatureMap):
        tables = prepare_tables(tables, tile, candidates_per_bucket)
    C = candidates_per_bucket
    Vp = tables.stats_t.shape[1]
    H = tables.bucket_start.shape[0]
    Q = q_xyz.shape[0]
    pad = (-Q) % tile
    Qp = Q + pad
    qx = jnp.pad(q_xyz, ((0, pad), (0, 0)))
    qm = jnp.pad(q_mask, (0, pad))

    # --- candidate prep in XLA (small gathers from the bucket tables)
    g = (qx - tables.origin) / tables.leaf              # build()'s grid
    base = jnp.floor(g).astype(jnp.int32)
    frac = g - base
    step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)
    combos = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
                       jnp.int32)
    cells = base[:, None, :] + combos[None, :, :] * step[:, None, :]  # (Q,8,3)
    hb = _hash3(cells, H)
    start = tables.bucket_start[hb]                     # (Q, 8)
    count = tables.bucket_count[hb]
    lane = jnp.arange(C, dtype=jnp.int32)
    cand = start[..., None] + lane                      # (Q, 8, C)
    ok = lane < count[..., None]
    # invalid lanes -> sentinel column (key never matches)
    cand = jnp.where(ok, jnp.minimum(cand, Vp - 1), Vp - 1)
    expect = _coord_key(cells)                          # (Q, 8)
    expect = jnp.where(qm[:, None], expect, jnp.int32(-1))
    expect = jnp.repeat(expect, C, axis=1)              # (Q, 24)

    candT = cand.reshape(Qp, 8 * C).T                   # (24, Qp)
    expectT = expect.T
    qT = qx.T                                           # (3, Qp)

    n_tiles = Qp // tile
    kernel = functools.partial(_lookup_kernel, n_cand=8 * C, tile=tile)
    row, d2, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((12, Vp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),      # statsT (pinned)
            pl.BlockSpec((8 * C, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),      # candidates
            pl.BlockSpec((8 * C, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),      # expected keys
            pl.BlockSpec((3, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),      # queries
        ],
        out_specs=[
            pl.BlockSpec((12, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(tables.stats_t, candT, expectT, qT)

    row = row[:, :Q].T                                  # (Q, 12)
    d2 = d2[0, :Q]
    found = jnp.isfinite(d2)
    return VoxelLookup(
        idx=jnp.clip(idx[0, :Q], 0, tables.capacity - 1), found=found,
        mean=row[:, 1:4], direction=row[:, 4:7], d=row[:, 7],
    )
