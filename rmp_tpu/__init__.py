"""rmp_tpu — TPU-native Riemannian Motion Policies framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TomGoesGitHub/Riemannian-Motion-Policies: differentiable URDF kinematics,
composable taskmaps, the full v1/v2 RMP policy libraries, a metric-weighted
least-squares combination core, a jit-compiled articulated physics simulator
with analytic collision distances, batched/sharded multi-environment rollouts,
and the 11 reference experiment scenarios.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# This workload is small-matrix fp32 numerics (4x4 chain products, <=16x9
# pullbacks, 9x9 solves): on TPU the MXU's default bf16 passes introduce
# ~1e-3 errors that break trajectory parity outright. True-fp32 matmuls cost
# nothing at these shapes (the workload is bandwidth/fusion bound), so the
# framework pins HIGHEST matmul precision globally. Opt out with
# RMP_TPU_DEFAULT_MATMUL_PRECISION=default|high|highest.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("RMP_TPU_DEFAULT_MATMUL_PRECISION", "highest"))
