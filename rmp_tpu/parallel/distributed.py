"""Multi-host / multi-slice scaling helpers.

The workload's only parallel axis is the environment batch (SURVEY.md §2
audit), and envs are embarrassingly parallel: within a slice the ('env',)
mesh rides ICI with zero steady-state collectives (parallel/mesh.py); across
slices/hosts the same mesh simply spans all global devices and the only DCN
traffic is the final metrics all-reduce.

Single-host (or the driver's virtual-device dryrun) needs none of this; call
`initialize()` once per process on real multi-host deployments before any
jax usage, then build meshes/shardings exactly as in parallel/mesh.py —
jax.devices() already enumerates the global devices.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection defaults.

    On Cloud TPU pods all three arguments are discovered from the metadata
    environment; pass them explicitly elsewhere (e.g. GPU clusters)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_env_mesh():
    """('env',) mesh over ALL global devices (every host's chips).

    With jax.jit + NamedSharding over this mesh, each host feeds its local
    shard of the env batch (jax.make_array_from_process_local_data) and XLA
    keeps the rollout fully local to each chip; only metric reductions cross
    ICI/DCN."""
    import numpy as np

    from rmp_tpu.parallel.mesh import ENV_AXIS
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (ENV_AXIS,))


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's shard of a global env batch."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per
