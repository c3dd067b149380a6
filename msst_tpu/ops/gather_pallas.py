"""Pallas TPU row-gather via one-hot MXU matmul.

The voxel-map lookup's hot op is a wide-row gather: ``probe[idx]`` with
``probe (H, W)`` and ``idx (N,)`` (``ops/voxelmap.lookup``, the rebuilt
``pcl::KdTreeFLANN`` role of ``mapOptmization.cpp:993,1089``).  Mosaic
cannot express that gather directly — ``tpu.dynamic_gather`` is a
single-vreg lane shuffle, and every multi-vreg reformulation
(take_along_axis over lanes or sublanes) hits "Not implemented: Multiple
source vregs along gather dimension" (docs/DESIGN.md round-2 Pallas notes;
re-attempted each toolchain bump by tests/test_pallas_toolchain.py).

The ONE fully-expressible formulation is gather-as-matmul: out = onehot(idx)
@ table, with the (N, H) one-hot built on the fly per (row-tile, H-chunk)
block from an iota comparison — no gather anywhere, all FLOPs on the MXU,
the table streamed HBM->VMEM chunk by chunk by the grid pipeline.  The
arithmetic is brutal by construction (H multiplies per gathered element
instead of 1 indexed read): at the production lookup shape (N = 81920
candidate rows, H = 131072 buckets, W = 24) that is ~515 GFLOP for a gather
XLA's native hardware path does in under a millisecond.  This module exists
to MEASURE that gap on real hardware rather than assert it (round-3 VERDICT
#2); scripts/pallas_bench.py records the numbers in docs/DESIGN.md.

It is also a genuinely useful kernel shape for SMALL tables (H <= ~2k),
where one resident MXU pass can beat a latency-bound random gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(idx_ref, table_ref, out_ref, *, h_chunk):
    """Grid: (row tiles, H chunks).  The output tile stays resident while
    the inner (H-chunk) grid dimension streams the table through VMEM;
    accumulation across chunks is exact (each index hits exactly one
    chunk)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                                     # (T, 1) int32
    T = idx.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, h_chunk), 1)
    onehot = ((idx - c * h_chunk) == col).astype(jnp.float32)
    out_ref[:] += jnp.dot(onehot, table_ref[:],
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "h_chunk", "interpret"))
def onehot_gather_rows(table: Array, idx: Array, tile: int = 256,
                       h_chunk: int = 1024,
                       interpret: bool | None = None) -> Array:
    """``table[idx]`` as a Pallas one-hot MXU matmul.

    table: (H, W) float32 (H padded to h_chunk, W to 128 internally).
    idx:   (N,) int32 in [0, H).
    Returns (N, W) float32 == table[idx].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = table.shape
    N = idx.shape[0]
    Hp = -(-H // h_chunk) * h_chunk
    Wp = -(-W // 128) * 128
    Np = -(-N // tile) * tile
    table_p = jnp.pad(table, ((0, Hp - H), (0, Wp - W)))
    # out-of-range/padded indices -> a real row (its output is discarded)
    idx_p = jnp.clip(jnp.pad(idx, (0, Np - N)), 0, H - 1)[:, None]

    out = pl.pallas_call(
        functools.partial(_kernel, h_chunk=h_chunk),
        grid=(Np // tile, Hp // h_chunk),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_chunk, Wp), lambda t, c: (c, 0),
                         memory_space=pltpu.VMEM),  # table streams by chunk
        ],
        out_specs=pl.BlockSpec((tile, Wp), lambda t, c: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Wp), jnp.float32),
        interpret=interpret,
    )(idx_p, table_p)
    return out[:N, :W]
