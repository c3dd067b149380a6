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
