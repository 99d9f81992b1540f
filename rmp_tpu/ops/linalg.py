"""Small-matrix linear algebra, unrolled for TPU.

XLA's batched LU/Cholesky kernels are serial and slow for tiny systems (the
RMP resolve is a 9x9 solve per environment; lax.linalg costs ~10x the rest of
the control tick combined). For static n <= ~20 a trace-time-unrolled
Cholesky solve lowers to a few hundred fused (B,)-elementwise ops and runs at
memory speed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def safe_denom(d: Array, eps: float = 1e-12) -> Array:
    """Sign-preserving magnitude clamp: |result| >= eps, sign kept (0 -> +eps).

    Guards divisions by (near-)singular pivots/diagonals so an exactly
    singular combined metric yields a large-but-finite solution instead of
    Inf/NaN propagating through the rest of a rollout. Downstream divergence
    guards (Env.max_qdd) then bound the command magnitude."""
    return jnp.where(d >= 0, jnp.maximum(d, eps), jnp.minimum(d, -eps))


def cholesky_solve_unrolled(A: Array, b: Array, ridge: float = 1e-6) -> Array:
    """Solve (sym(A) + ridge*I) x = b for PSD A. A: (..., n, n), b: (..., n).

    Fully unrolled at trace time (n static): Cholesky factorization +
    forward/backward substitution as scalar-slice arithmetic, batched over
    leading axes. No lax.linalg involved.
    """
    n = A.shape[-1]
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))

    # Cholesky: L[i][j] python lists of (...,)-shaped arrays
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[..., j, j] + ridge
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-12))
        inv_Ljj = 1.0 / Ljj
        L[j][j] = Ljj
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_Ljj

    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # backward substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def lu_solve_unrolled(A: Array, b: Array) -> Array:
    """Solve A x = b by trace-time-unrolled Gaussian elimination WITH partial
    pivoting. A: (..., n, n), b: (..., n); batched over leading axes.

    Unlike the Cholesky path this is valid for INDEFINITE systems — which the
    combined RMP metric can become near the JointVelocityCap's singular band
    (the reference's metric w/(1 - ratio^2) is its own quirk there, rmp2.py:
    104-109) — while staying ~an order of magnitude faster than lax.linalg's
    serial batched LU at small n.
    """
    n = A.shape[-1]
    # work on rows as lists of (..., n) slices; b appended as column n
    rows = [jnp.concatenate([A[..., i, :], b[..., i:i + 1]], axis=-1)
            for i in range(n)]

    for k in range(n):
        # partial pivot: select the row (>= k) with max |col k| via pairwise
        # maxima (static unroll) — swap-free: build pivot row and fold the
        # displaced row back
        piv = rows[k]
        piv_mag = jnp.abs(piv[..., k])
        for i in range(k + 1, n):
            mag_i = jnp.abs(rows[i][..., k])
            take = (mag_i > piv_mag)[..., None]
            # the row NOT chosen as pivot continues to live at position i
            new_i = jnp.where(take, piv, rows[i])
            piv = jnp.where(take, rows[i], piv)
            piv_mag = jnp.maximum(piv_mag, mag_i)
            rows[i] = new_i
        rows[k] = piv
        inv_pivot = 1.0 / safe_denom(piv[..., k])
        for i in range(k + 1, n):
            factor = rows[i][..., k] * inv_pivot
            rows[i] = rows[i] - factor[..., None] * piv

    # back substitution (diagonal clamped the same way: a singular system —
    # the velocity-cap band that motivates this path — must stay finite)
    x = [None] * n
    for i in reversed(range(n)):
        s = rows[i][..., n]
        for j in range(i + 1, n):
            s = s - rows[i][..., j] * x[j]
        x[i] = s / safe_denom(rows[i][..., i])
    return jnp.stack(x, axis=-1)
