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
