"""Estimator state checkpoint / resume.

The reference has terminal-state export only (the ``save_map`` service,
SURVEY.md §5); since the TPU estimator state is an explicit array pytree,
full mid-run checkpointing is one np.savez: any LioState (keyframe store,
factor graph, ESKF, cached map) round-trips losslessly, enabling true resume
and multi-session map reuse.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, template):
    """Load into the structure of `template` (an equally-shaped state, e.g.
    from init_state with the same params)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    n = int(data["n_leaves"])
    if n != len(leaves):
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(leaves)} "
            "(parameter caps must match)")
    new_leaves = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(ref)):
            raise ValueError(f"leaf {i}: shape {arr.shape} != {np.shape(ref)}")
        new_leaves.append(jnp.asarray(arr, dtype=ref.dtype if hasattr(ref, "dtype") else None))
    return jax.tree.unflatten(treedef, new_leaves)
