"""Multi-session SPMD mapping: one LIO estimator per mesh device.

Parallel sessions (robots / rosbag replays) run the full odometry step
data-parallel over the mesh: the batched ``LioState`` is sharded on its
leading axis, each device advances its own session entirely locally, and the
only collectives are cheap ``psum`` reductions for fleet-level statistics
(map size, degeneracy counts).  This is the multi-chip story promised by
SURVEY.md §2.8's final row — scaling as a ``jax.sharding`` annotation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.liosam.mapping import StepInput, odometry_step
from ..models.liosam.params import LioParams
from ..models.liosam.state import LioState, init_state


def make_batched_state(p: LioParams, batch: int) -> LioState:
    s = init_state(p)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)


@partial(jax.jit, static_argnames=("p", "mesh", "axis"))
def batched_odometry_step(states: LioState, inputs: StepInput, p: LioParams,
                          mesh: Mesh, axis: str = "session"):
    """vmapped odometry step with explicit shardings over the mesh.

    Returns (new_states, outputs, fleet_stats) where fleet_stats are
    cross-session psum reductions (these exercise the ICI collectives)."""
    batched = jax.vmap(lambda s, i: odometry_step(s, i, p))

    shard = NamedSharding(mesh, P(axis))

    def run(states, inputs):
        new_states, outs = batched(states, inputs)
        stats = {
            "total_keyframes": jnp.sum(outs.kf_count),
            "degenerate_sessions": jnp.sum(outs.degenerate.astype(jnp.int32)),
            "mean_speed": jnp.mean(jnp.linalg.norm(outs.velocity, axis=-1)),
        }
        return new_states, outs, stats

    states = jax.lax.with_sharding_constraint(
        states, jax.tree.map(lambda _: shard, states))
    inputs = jax.lax.with_sharding_constraint(
        inputs, jax.tree.map(lambda _: shard, inputs))
    return run(states, inputs)


@partial(jax.jit, static_argnames=("p", "mesh", "axis"))
def cooperative_map_merge(states: LioState, scan_time, p: LioParams,
                          mesh: Mesh, axis: str = "session") -> LioState:
    """Collaborative mapping: every session rebuilds its cached local map
    from the FLEET's keyframes, not just its own.

    Each device ``all_gather``s the other sessions' keyframe stores over the
    ICI mesh axis and re-assembles its local map from keyframes (any
    session's) within the search radius of its current pose — multi-robot
    map sharing, the cooperative multi-chip workload beyond plain data
    parallelism.  The collective is load-bearing: without the all_gather a
    session entering territory mapped only by another session has NO local
    map there (tested in tests/test_parallel.py).

    Memory note: this gathers full keyframe stores (S x per-device store).
    For production fleets, gather keyframe positions first and ppermute only
    the selected clouds; at current capacities the full gather is cheap.
    """
    shard_map = jax.shard_map

    from ..models.liosam.mapping import _rebuild_local_map
    from ..models.liosam.state import KeyframeStore

    def per_device(st: LioState, t):
        kf = st.kf
        K = kf.pose6.shape[1]
        valid = jnp.arange(K)[None, :] < kf.count[:, None]      # (b, K)

        def gath(x):
            g = jax.lax.all_gather(x, axis)                     # (S, b, K, ...)
            return g.reshape((-1,) + g.shape[3:])

        fvalid = gath(valid)
        fleet = KeyframeStore(
            # invalid slots: parked at infinity and ancient, so neither the
            # radius nor the 10 s recency gate of _assemble_local_map selects
            # them (their cloud masks are also cleared)
            pose6=jnp.where(fvalid[:, None], gath(kf.pose6), 1e9),
            time=jnp.where(fvalid, gath(kf.time), -1e9),
            corner_xyz=gath(kf.corner_xyz),
            corner_mask=gath(kf.corner_mask) & fvalid[:, None],
            surf_xyz=gath(kf.surf_xyz),
            surf_mask=gath(kf.surf_mask) & fvalid[:, None],
            count=jnp.asarray(fvalid.shape[0], jnp.int32),
        )
        local = jax.vmap(lambda pos, tt: _rebuild_local_map(fleet, pos, tt, p)
                         )(st.pose6[:, 3:], t)
        return st._replace(local_map=local)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P(axis)), out_specs=P(axis))
    return fn(states, scan_time)
