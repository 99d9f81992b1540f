"""Learned RMP leaves: MLP-parameterized (accel, metric) policies.

Beyond-reference capability. The reference's policies are hand-designed
closed forms (rmp.py:226-382, rmp2.py:31-226) with constructor-constant
gains; its PyBullet C++ `stepSimulation` blocks autodiff, so a learned leaf
was structurally impossible there. Here policy params are traced pytree
leaves and the batched rollout differentiates end-to-end (FK -> taskmaps ->
pullback/resolve -> integrator, see experiments/tune_gains.py), so an MLP
leaf trains with jax.grad straight through the physics — the RMP2-style
"learnable motion policy" extension, TPU-native.

Design rules inherited from the framework:
  * the metric head emits a CHOLESKY factor (softplus-positive diagonal),
    so the learned metric is symmetric PSD by construction — the combined
    pullback Gram matrix stays resolvable no matter where training wanders;
  * the accel head is tanh-bounded and scaled, so an untrained/diverging
    net cannot command unbounded accelerations (the env's max_qdd guard
    stays a backstop, not the primary safety);
  * all shapes are static; params flow through Env.gather_params like any
    hand-designed policy's, so goal binding (bind_goal), the grid sweep
    (experiments/sweep_randomized.py) and gradient tuning all apply
    unchanged.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rmp_tpu.ops import geom
from rmp_tpu.policies.base import Policy


def mlp_init(key, sizes: tuple) -> dict:
    """Glorot-uniform MLP params {'w0','b0',...} for layer widths `sizes`."""
    net = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        lim = float(np.sqrt(6.0 / (n_in + n_out)))
        net[f"w{i}"] = jax.random.uniform(
            keys[i], (n_in, n_out), jnp.float32, -lim, lim)
        net[f"b{i}"] = jnp.zeros((n_out,), jnp.float32)
    return net


def mlp_apply(net: dict, h):
    """tanh-MLP forward; linear final layer. Batched over leading dims."""
    n_layers = len(net) // 2
    for i in range(n_layers):
        h = h @ net[f"w{i}"] + net[f"b{i}"]
        if i + 1 < n_layers:
            h = jnp.tanh(h)
    return h


def _chol_from_raw(raw, d: int):
    """(..., d + d(d-1)/2) raw entries -> (..., d, d) lower-triangular L
    with softplus-positive diagonal. Scatter-free: the strict-lower entries
    are placed by contracting with a CONSTANT basis tensor (scatter ops in
    hot graphs are a measured ~280 s compile cliff, CLAUDE.md)."""
    diag = jax.nn.softplus(raw[..., :d])                       # (..., d)
    rows, cols = np.tril_indices(d, k=-1)
    basis = np.zeros((len(rows), d * d), np.float32)
    basis[np.arange(len(rows)), rows * d + cols] = 1.0         # constant
    # explicit broadcast multiply-reduce (contraction dim d(d-1)/2 <= 3 for
    # d=3): a tiny einsum/dot here would be a separate latency-bound MXU
    # dispatch per tick (the geom.mm routing lesson, DESIGN.md §10)
    flat = jnp.sum(raw[..., d:, None] * jnp.asarray(basis), axis=-2)
    L = flat.reshape(raw.shape[:-1] + (d, d))
    L = L + diag[..., :, None] * jnp.eye(d, dtype=raw.dtype)
    return L


def _neural_attractor_accel_metric(params, x, xd, ctx):
    del ctx
    d = x.shape[-1]
    feats = jnp.concatenate([params["goal"] - x, xd], axis=-1)   # (P, 2d)
    # feat_scale keeps workspace-scale inputs (meters, rad/s) inside the
    # tanh layers' linear range — unscaled, long-horizon training saturates
    # the first layer and plateaus (measured: 80-tick runs stall at a
    # goal-independent policy)
    out = mlp_apply(params["net"], feats / params["feat_scale"])
    a = params["accel_scale"] * jnp.tanh(out[..., :d])
    L = _chol_from_raw(out[..., d:], d)
    M = geom.mm(L, jnp.swapaxes(L, -1, -2))
    eye = jnp.eye(d, dtype=x.dtype)
    M = params["metric_scale"] * (M + params["metric_eps"] * eye)
    return a, M


def head_sizes(d: int) -> int:
    """MLP output width for a d-dim task space: accel d + Cholesky
    d (diag) + d(d-1)/2 (strict lower)."""
    return d + d + d * (d - 1) // 2


OBSTACLE_FEATURES = 3   # (x/r, exp(-x/sigma), xd/v_scale) per pair


def _neural_obstacle_accel_metric(params, x, xd, ctx):
    # x: (P, 1) signed distances on the 1-D distance taskmap (the same
    # task space as the hand-designed v2.obstacle_avoidance); xd: (P, 1)
    # approach rate. ONE shared net scores every (link, obstacle) pair —
    # mlp_apply broadcasts over the P axis.
    r = params["support_radius"]
    xc = jnp.maximum(x, 0.0)             # clamp penetration for features
    feats = jnp.concatenate(
        [xc / r,
         jnp.exp(-xc / params["feat_sigma"]),   # sharpens the near field
         xd / params["vel_scale"]], axis=-1)    # (P, 3)
    out = mlp_apply(params["net"], feats)       # (P, 2)
    # near-field AUTHORITY is structural, its PROFILE is learned: the
    # accel is tanh-bounded but its bound grows by repulsion_boost inside
    # repulsion_sigma of contact (matching the hand leaf's 800*exp(-x/.01)
    # peak authority, v2.py:127), and the metric carries the same 1/x
    # exploder barrier as the hand leaf (v2.py:124-125). A purely bounded
    # head trained to 96.6% success but kept a 9.6% final-penetration rate
    # (vs the hand leaf's 1.0%) — the net cannot LEARN an unbounded
    # barrier through a bounded parametrization.
    boost = 1.0 + params["repulsion_boost"] * jnp.exp(
        -xc / params["repulsion_sigma"])
    a = params["accel_scale"] * jnp.tanh(out[..., :1]) * boost   # (P, 1)
    # STRUCTURAL locality: the learned metric is gated by the same smooth
    # quadratic support the hand-designed policy uses (v2.py:121-123), so
    # beyond support_radius the leaf's pullback weight is EXACTLY zero —
    # far-field behavior stays the attractor's no matter where training
    # wanders, and the far field costs no learned capacity.
    gate = xc * xc / (r * r) - 2.0 * xc / r + 1.0
    gate = jnp.where(xc > r, jnp.zeros_like(gate), gate)
    exploder = 1.0 / (xc / params["metric_exploder_std_dev"]
                      + params["metric_exploder_eps"])
    metric = (params["metric_scale"] * jax.nn.softplus(out[..., 1:2])
              * gate * exploder)
    if ctx is not None and "mask" in ctx:
        metric = metric * ctx["mask"].reshape(-1)[:, None]
    return a, metric[..., None]                                  # (P, 1, 1)


def transparent_obstacle_init(net: dict, metric_raw: float = -4.0,
                              accel_raw: float = 0.3) -> dict:
    """Zero the head's final layer WEIGHTS so the leaf starts
    input-independent: accel tanh(accel_raw) * boost (a mild constant
    REPULSION — positive pushes the distance up), metric
    softplus(metric_raw) ~ 0.018 * metric_scale * gate * exploder.
    Training then shapes both out of clean dynamics. Two measured failure
    modes motivate this: a randomly-initialized head (+-accel_scale noise
    on every pair) drowns the attractor and training diverges into a
    frozen-arm basin; and a ZERO accel bias under the near-contact metric
    barrier freezes the ~21% of randomized envs that SPAWN penetrating
    (huge metric says hold, no accel says escape — measured penetrated
    0.60 / solved 0.19 vs 0.35/0.53 without the barrier)."""
    i = len(net) // 2 - 1
    out = dict(net)
    out[f"w{i}"] = jnp.zeros_like(net[f"w{i}"])
    out[f"b{i}"] = jnp.asarray([accel_raw, metric_raw], jnp.float32)
    return out


def neural_obstacle(taskmap, net: dict, support_radius: float = 0.5,
                    feat_sigma: float = 0.1, vel_scale: float = 1.0,
                    accel_scale: float = 20.0, metric_scale: float = 5.0,
                    repulsion_boost: float = 0.0,
                    repulsion_sigma: float = 0.01,
                    metric_exploder_std_dev: float | None = None,
                    metric_exploder_eps: float = 0.001,
                    name: str = "neural_obstacle") -> Policy:
    """Learned obstacle-avoidance leaf on a 1-D distance taskmap.

    Drop-in replacement for the hand-designed v2.obstacle_avoidance
    (reference rmp2.py:140-196): same task space (per-pair signed
    distance), same ctx mask protocol, same zero-beyond-support locality —
    but the repulsion/damping/metric shaping inside the support radius is
    an MLP trained end-to-end through the differentiable rollout
    (experiments/train_neural_clutter.py). net comes from
    mlp_init(key, (OBSTACLE_FEATURES, *hidden, 2)).
    """
    w_last = net[f"w{len(net) // 2 - 1}"]
    if int(net["w0"].shape[0]) != OBSTACLE_FEATURES:
        raise ValueError(
            f"net input width {int(net['w0'].shape[0])} != "
            f"OBSTACLE_FEATURES = {OBSTACLE_FEATURES}")
    if int(w_last.shape[-1]) != 2:
        raise ValueError(
            f"net output width {int(w_last.shape[-1])} != 2 (accel, metric)")
    if metric_exploder_std_dev is None:
        # identity barrier: 1/(x/1e9 + 1.0) == 1.0 to fp32 precision over
        # the whole support — the exploder factor vanishes from the math
        # without a second traced code path
        metric_exploder_std_dev, metric_exploder_eps = 1e9, 1.0
    params = dict(net=net,
                  support_radius=jnp.asarray(support_radius, jnp.float32),
                  feat_sigma=jnp.asarray(feat_sigma, jnp.float32),
                  vel_scale=jnp.asarray(vel_scale, jnp.float32),
                  accel_scale=jnp.asarray(accel_scale, jnp.float32),
                  metric_scale=jnp.asarray(metric_scale, jnp.float32),
                  repulsion_boost=jnp.asarray(repulsion_boost, jnp.float32),
                  repulsion_sigma=jnp.asarray(repulsion_sigma, jnp.float32),
                  metric_exploder_std_dev=jnp.asarray(
                      metric_exploder_std_dev, jnp.float32),
                  metric_exploder_eps=jnp.asarray(
                      metric_exploder_eps, jnp.float32))
    return Policy(name, taskmap, _neural_obstacle_accel_metric, params)


def neural_attractor(goal, taskmap, net: dict, accel_scale: float = 4.0,
                     metric_scale: float = 1.0, metric_eps: float = 0.05,
                     feat_scale=None, name: str = "neural_target") -> Policy:
    """Learned goal attractor on `taskmap` (task dim d inferred from goal).

    `net` comes from mlp_init(key, (2*d, *hidden, head_sizes(d))); the
    weights live in params['net'] so Env.gather_params exposes them to
    optimizers directly (see experiments/train_neural_rmp.py).
    """
    goal = jnp.asarray(goal, jnp.float32)
    d = goal.shape[-1]
    w_last = net[f"w{len(net) // 2 - 1}"]
    if int(w_last.shape[-1]) != head_sizes(d):
        raise ValueError(
            f"net output width {int(w_last.shape[-1])} != head_sizes({d}) "
            f"= {head_sizes(d)}")
    if int(net["w0"].shape[0]) != 2 * d:
        raise ValueError(
            f"net input width {int(net['w0'].shape[0])} != 2*d = {2 * d} "
            f"(features are concat(goal - x, xd))")
    if feat_scale is None:
        feat_scale = np.ones(2 * d, np.float32)
    params = dict(goal=goal, net=net,
                  accel_scale=jnp.asarray(accel_scale, jnp.float32),
                  metric_scale=jnp.asarray(metric_scale, jnp.float32),
                  metric_eps=jnp.asarray(metric_eps, jnp.float32),
                  feat_scale=jnp.asarray(feat_scale, jnp.float32))
    return Policy(name, taskmap, _neural_attractor_accel_metric, params)
