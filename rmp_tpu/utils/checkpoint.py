"""Checkpoint / resume for simulation state pytrees.

The reference 'checkpoints' by hand-pasting printed q/q̇ into comments
(06_cluttered_environment.py:135-163). Here: any pytree (SimState, EnvState,
batched rollout state) serializes via flax msgpack to a file and restores
against a like-structured template.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    """Serialize any pytree (custom nodes included) as its flattened leaves."""
    leaves = [np.asarray(x) for x in jax.tree.leaves(tree)]
    with open(path, "wb") as f:
        f.write(serialization.to_bytes({str(i): l for i, l in enumerate(leaves)}))


def restore_checkpoint(path: str, like):
    """Restore into the structure of `like` (same pytree template)."""
    with open(path, "rb") as f:
        data = f.read()
    template_leaves, treedef = jax.tree.flatten(like)
    target = {str(i): np.asarray(l) for i, l in enumerate(template_leaves)}
    restored = serialization.from_bytes(target, data)
    leaves = [jnp.asarray(restored[str(i)]) for i in range(len(template_leaves))]
    return jax.tree.unflatten(treedef, leaves)
