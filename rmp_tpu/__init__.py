"""rmp_tpu — TPU-native Riemannian Motion Policies framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TomGoesGitHub/Riemannian-Motion-Policies: differentiable URDF kinematics,
composable taskmaps, the full v1/v2 RMP policy libraries, a metric-weighted
least-squares combination core, a jit-compiled articulated physics simulator
with analytic collision distances, batched/sharded multi-environment rollouts,
and the 11 reference experiment scenarios.
"""

__version__ = "0.1.0"
