"""RMP metric helpers.

Capability parity with reference helper/rmp_helper.py:62-74 (soft_norm,
directionally_stretched_metric), written row-batched: inputs carry a leading
pair axis (..., d).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def soft_norm(v: Array, c: float | Array) -> Array:
    """v / h(||v||) with h(z) = z + (1/c) log(1 + exp(-2 c z)).

    Smoothly normalizes v; near zero the output goes to 0 instead of blowing
    up (h(0) = log(2)/c). Reference helper/rmp_helper.py:62-65.
    """
    z = jnp.linalg.norm(v, axis=-1, keepdims=True)
    h = z + (1.0 / c) * jnp.log1p(jnp.exp(-2.0 * c * z))
    return v / h


def directionally_stretched_metric(v: Array, beta: float | Array,
                                   c: float | Array) -> Array:
    """H = beta * zeta zeta^T + (1 - beta) * I, zeta = soft_norm(v, c).

    v: (..., d) -> (..., d, d). beta may be scalar or (...,)-shaped.
    Reference helper/rmp_helper.py:67-74.
    """
    zeta = soft_norm(v, c)
    outer = zeta[..., :, None] * zeta[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(v.shape[-1], dtype=v.dtype), outer.shape)
    beta = jnp.asarray(beta, dtype=v.dtype)[..., None, None] \
        if jnp.ndim(beta) > 0 else beta
    return beta * outer + (1.0 - beta) * eye


def cubic_spline_weight(d: Array, r: float | Array) -> Array:
    """w(d): cubic with w(0)=1, w'(0)=0, w(r)=0, w'(r)=0; 0 beyond r.

    The obstacle/joint-limit proximity weight used by the v1 policies
    (reference rmp.py:300-306, rmp.py:363-370).
    """
    spline = (2.0 / r**3) * d**3 + (-3.0 / r**2) * d**2 + 1.0
    return jnp.where(d > r, jnp.zeros_like(spline), spline)
