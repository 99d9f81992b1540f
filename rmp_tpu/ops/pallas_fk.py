"""Pallas TPU kernel: batched analytic FK derivatives.

Generates, per KinematicModel, ONE kernel computing the full twist-generator
recursion of models/fk_derivatives.py — world transforms T, velocities Ṫ,
curvatures T̈|q̈=0, and all Jacobian columns ∂T_k/∂q_j = G_j T_k — for 512
environments per grid step (vectors are (4, 128) VPU tiles; envs on
sublanes x lanes; see the BLOCK/VMEM note below).

Two things make this fast where the XLA path is bandwidth-bound:
  * zero intermediate HBM traffic: the ~200 4x4 chain products live entirely
    in registers/VMEM;
  * constant-sparsity-aware codegen: matrix entries are Python floats until
    they become env-dependent, so multiplications by the many structural
    zeros/ones of T_const / generators are elided at trace time.

Semantics oracle: models/fk_derivatives.fk_derivatives (cross-checked in
tests/test_pallas_fk.py, itself verified against autodiff + the reference).

Benchmark note (v5e, B=4096): this kernel runs at ~50us — statistically tied
with the XLA elementwise-lowered analytic path (~45us) once that path uses
the scatter-free stacking + VPU small-matmul lowering; both sit near the
9.4MB output-bandwidth floor. It is kept as a validated alternative and as
the starting point for a future fully-fused rows kernel (FK + posts +
policies in one kernel, eliminating the J16 materialization entirely).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmp_tpu.models.urdf import (FIXED, PRISMATIC, REVOLUTE, ROOT,
                                 KinematicModel)

Array = jax.Array

SUBLANES = 4
LANES = 128
BLOCK = SUBLANES * LANES      # 512 envs per grid step (VMEM: the J output
                              # block is ~3.5MB; double-buffered outputs must
                              # stay under the 16MB VMEM budget)
_EPS_CONST = 1e-30


def _is_const(x) -> bool:
    return isinstance(x, (int, float, np.floating))


def _add(a, b):
    if _is_const(a) and abs(a) < _EPS_CONST:
        return b
    if _is_const(b) and abs(b) < _EPS_CONST:
        return a
    return a + b


def _mul(a, b):
    if (_is_const(a) and abs(a) < _EPS_CONST) or \
       (_is_const(b) and abs(b) < _EPS_CONST):
        return 0.0
    if _is_const(a) and a == 1.0:
        return b
    if _is_const(b) and b == 1.0:
        return a
    return a * b


def _mm44(A, B):
    """4x4 product of matrices whose entries are floats or (SUBLANES,128) arrays."""
    return [[functools.reduce(_add, (_mul(A[i][k], B[k][j]) for k in range(4)))
             for j in range(4)] for i in range(4)]


def _madd44(A, B):
    return [[_add(A[i][j], B[i][j]) for j in range(4)] for i in range(4)]


def _msub44(A, B):
    return [[_add(A[i][j], _mul(-1.0, B[i][j])) for j in range(4)]
            for i in range(4)]


def _scale44(s, A):
    return [[_mul(s, A[i][j]) for j in range(4)] for i in range(4)]


def _const44(M):
    return [[float(M[i][j]) for j in range(4)] for i in range(4)]


def _rigid_inv(A):
    """Inverse of a rigid 4x4 (entries float/array)."""
    R = [[A[j][i] for j in range(3)] for i in range(3)]      # transpose
    t = [functools.reduce(_add, (_mul(-1.0, _mul(R[i][k], A[k][3]))
                                 for k in range(3))) for i in range(3)]
    return [[R[0][0], R[0][1], R[0][2], t[0]],
            [R[1][0], R[1][1], R[1][2], t[1]],
            [R[2][0], R[2][1], R[2][2], t[2]],
            [0.0, 0.0, 0.0, 1.0]]


def _axis_rotation(axis, q_vec):
    """Rodrigues for a CONSTANT axis and env-vector angle -> 4x4 entries."""
    c = jnp.cos(q_vec)
    s = jnp.sin(q_vec)
    x, y, z = (float(a) for a in axis)
    one_c = 1.0 - c
    R = [
        [_add(c, _mul(x * x, one_c)), _add(_mul(x * y, one_c), _mul(-z, s)),
         _add(_mul(x * z, one_c), _mul(y, s)), 0.0],
        [_add(_mul(x * y, one_c), _mul(z, s)), _add(c, _mul(y * y, one_c)),
         _add(_mul(y * z, one_c), _mul(-x, s)), 0.0],
        [_add(_mul(x * z, one_c), _mul(-y, s)),
         _add(_mul(y * z, one_c), _mul(x, s)), _add(c, _mul(z * z, one_c)),
         0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    return R


def _generator_E(model, i):
    jt = model.joint_type[i]
    x, y, z = (float(a) for a in model.axis[i])
    E = [[0.0] * 4 for _ in range(4)]
    if jt == REVOLUTE:
        E[0][1], E[0][2] = -z, y
        E[1][0], E[1][2] = z, -x
        E[2][0], E[2][1] = -y, x
    else:  # PRISMATIC
        E[0][3], E[1][3], E[2][3] = x, y, z
    return E


def _make_kernel(model: KinematicModel):
    F = model.n_frames
    n = model.n_q

    def kernel(q_ref, qd_ref, T_out, Td_out, c_out, J_out):
        q = [q_ref[j, 0] for j in range(n)]          # (SUBLANES, 128) each
        qd = [qd_ref[j, 0] for j in range(n)]

        eye = _const44(np.eye(4))
        zero = [[0.0] * 4 for _ in range(4)]

        T = [None] * F
        W = [None] * F
        Wd = [None] * F
        G = [None] * F

        for i in range(F):
            par = model.parent[i]
            T_par = eye if par == ROOT else T[par]
            W_par = zero if par == ROOT else W[par]
            Wd_par = zero if par == ROOT else Wd[par]
            T_const = _const44(model.T_constant[i])
            jt = model.joint_type[i]
            qi = model.q_index[i]

            A = _mm44(T_par, T_const)
            if jt == REVOLUTE:
                T_var = _axis_rotation(model.axis[i], q[qi])
            elif jt == PRISMATIC:
                x, y, z = (float(a) for a in model.axis[i])
                T_var = _const44(np.eye(4))
                T_var[0][3] = _mul(x, q[qi])
                T_var[1][3] = _mul(y, q[qi])
                T_var[2][3] = _mul(z, q[qi])
            else:
                T_var = eye
            T[i] = _mm44(A, T_var)

            if jt == FIXED:
                W[i], Wd[i] = W_par, Wd_par
            else:
                E = _generator_E(model, i)
                Gi = _mm44(_mm44(A, E), _rigid_inv(A))
                G[i] = Gi
                qd_i = qd[qi]
                W[i] = _madd44(W_par, _scale44(qd_i, Gi))
                comm = _msub44(_mm44(W_par, Gi), _mm44(Gi, W_par))
                Wd[i] = _madd44(Wd_par, _scale44(qd_i, comm))

        def _write(ref, f, M):
            for i in range(4):
                for j in range(4):
                    v = M[i][j]
                    if _is_const(v):
                        v = jnp.full((SUBLANES, LANES), float(v), jnp.float32)
                    ref[f, 4 * i + j, 0] = v

        for f in range(F):
            _write(T_out, f, T[f])
            _write(Td_out, f, _mm44(W[f], T[f]))
            acc = _madd44(Wd[f], _mm44(W[f], W[f]))
            _write(c_out, f, _mm44(acc, T[f]))
            anc = {model.q_index[j]: j for j in model.chain(f)
                   if model.joint_type[j] != FIXED}
            for m in range(n):
                col = _mm44(G[anc[m]], T[f]) if m in anc else zero
                for i in range(4):
                    for j in range(4):
                        v = col[i][j]
                        if _is_const(v):
                            v = jnp.full((SUBLANES, LANES), float(v),
                                         jnp.float32)
                        J_out[f, 16 * m + 4 * i + j, 0] = v

    return kernel


_CACHE: dict[int, "callable"] = {}


def fk_derivatives_batched(model: KinematicModel, q: Array, qd: Array):
    """Batched (T16, Td16, J16, c16) via the Pallas kernel.

    q, qd: (B, n) with B a multiple of BLOCK (512). Returns
    (B, F, 16), (B, F, 16), (B, F, 16, n), (B, F, 16) — same contract as
    vmapped models/fk_derivatives.fk_derivatives.
    """
    fn = _CACHE.get(id(model))
    if fn is None:
        fn = _build(model)
        _CACHE[id(model)] = fn
    return fn(q, qd)


def _build(model: KinematicModel):
    F = model.n_frames
    n = model.n_q
    kernel = _make_kernel(model)

    @jax.jit
    def run(q: Array, qd: Array):
        B = q.shape[0]
        assert B % BLOCK == 0, f"batch {B} must be a multiple of {BLOCK}"
        nb = B // BLOCK
        # (B, n) -> (n, nb, 8, 128)
        qT = q.T.reshape(n, nb, SUBLANES, LANES)
        qdT = qd.T.reshape(n, nb, SUBLANES, LANES)

        out_shapes = (
            jax.ShapeDtypeStruct((F, 16, nb, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((F, 16, nb, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((F, 16, nb, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((F, 16 * n, nb, SUBLANES, LANES), jnp.float32),
        )
        in_spec = pl.BlockSpec((n, 1, SUBLANES, LANES),
                               lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM)
        o16 = pl.BlockSpec((F, 16, 1, SUBLANES, LANES),
                           lambda b: (0, 0, b, 0, 0),
                           memory_space=pltpu.VMEM)
        oJ = pl.BlockSpec((F, 16 * n, 1, SUBLANES, LANES),
                          lambda b: (0, 0, b, 0, 0),
                          memory_space=pltpu.VMEM)

        T16, Td16, c16, J16 = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[in_spec, in_spec],
            out_specs=(o16, o16, o16, oJ),
            out_shape=out_shapes,
        )(qT, qdT)

        # back to batch-major
        def bm(x):  # (F, C, nb, 8, 128) -> (B, F, C)
            C = x.shape[1]
            return x.reshape(F, C, nb * BLOCK).transpose(2, 0, 1)
        T16b = bm(T16)
        Td16b = bm(Td16)
        c16b = bm(c16)
        J16b = bm(J16).reshape(nb * BLOCK, F, n, 16).swapaxes(-1, -2)
        return T16b, Td16b, J16b, c16b
    return run


