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
    host = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def restore_checkpoint(path: str, like):
    """Restore into the structure of `like` (same pytree template)."""
    with open(path, "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(like, data)
    return jax.tree.map(jnp.asarray, restored)
