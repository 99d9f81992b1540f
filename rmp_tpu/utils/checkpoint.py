"""Checkpoint / resume for simulation state pytrees.

The reference 'checkpoints' by hand-pasting printed q/q̇ into comments
(06_cluttered_environment.py:135-163). Here: any pytree (SimState, EnvState,
batched rollout state) serializes via flax msgpack to a file and restores
against a like-structured template.
"""
from __future__ import annotations

import os

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


def save_train_checkpoint(path: str, step: int, net, opt_state,
                          best_val: float, best_net) -> None:
    """Training-loop checkpoint for the neural-RMP trainers
    (experiments/train_neural_rmp.py, train_neural_clutter.py): the live
    net, the optax optimizer state (including the schedule step count, so
    the lr schedule resumes in place), the best-loss iterate, and the loop
    position. Written atomically (tmp + rename) so a kill mid-write never
    corrupts the previous checkpoint."""
    tree = dict(step=np.asarray(step, np.int32),
                best_val=np.asarray(best_val, np.float32),
                net=net, opt_state=opt_state, best_net=best_net)
    tmp = path + ".tmp"
    save_checkpoint(tmp, tree)
    os.replace(tmp, path)


def restore_train_checkpoint(path: str, net, opt_state):
    """Restore a save_train_checkpoint file against the shapes of a freshly
    initialized (net, opt_state). Returns (step, net, opt_state, best_val,
    best_net)."""
    tmpl = dict(step=np.zeros((), np.int32),
                best_val=np.zeros((), np.float32),
                net=net, opt_state=opt_state, best_net=net)
    c = restore_checkpoint(path, tmpl)
    return (int(c["step"]), c["net"], c["opt_state"],
            float(c["best_val"]), c["best_net"])


def save_checkpoint_sharded(path: str, tree) -> None:
    """Orbax checkpoint of a (possibly sharded) pytree — each host writes its
    own shards; restores onto any compatible mesh. Use for pod-scale batched
    EnvState snapshots; the msgpack path above covers single-host use."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.leaves(tree), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint_sharded(path: str, like):
    """Restore an orbax checkpoint into `like`'s structure and shardings."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    leaves, treedef = jax.tree.flatten(like)
    abstract = [jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=getattr(
        l, "sharding", None)) for l in leaves]
    restored = ckptr.restore(os.path.abspath(path), abstract)
    return jax.tree.unflatten(treedef, restored)
