"""Pallas TPU kernel: fused RMP pullback + Cholesky resolve.

Computes, for a batch of environments, from the row-stacked task coordinates
(all policies' pair rows concatenated: R = sum_i P_i * d_i):

    A_b = J_b^T W_b + ridge * I        (n x n;  W = M J rows)
    f_b = J_b^T v_b                    (v = M (a - c) rows)
    q̈_b = A_b^{-1} f_b                 (unrolled pivoted LU)

in ONE kernel with a batch-on-lanes layout: envs live on the 128-wide lane
axis, so every scalar of the factorization is a full VPU lane vector and the
pair-reduction runs as (R, 128) elementwise multiply-accumulates. This fuses
what the XLA path expresses as ~20 separate contraction/solve kernels.

This is the hot-op Pallas demonstration for the resolve stage; the jnp
reference implementation (ops/linalg.cholesky_solve_unrolled + core._pullback)
is the semantics oracle (tests/test_pallas_resolve.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128


def _safe_denom(d, eps: float = 1e-12):
    """Sign-preserving magnitude clamp (see ops/linalg.safe_denom)."""
    return jnp.where(d >= 0, jnp.maximum(d, eps), jnp.minimum(d, -eps))


def _lu_solve_lanes(A, f, n: int, ridge: float):
    """x = (A + ridge I)^{-1} f where every A[i][j]/f[i] is a (LANES,)
    env-vector: unrolled PIVOTED Gaussian elimination, lanes-parallel —
    valid for the indefinite combined metrics the policy stacks can
    produce (JointVelocityCap singular band); see ops/linalg.py."""
    # ridge (symmetrization is a no-op for the pullback Gram matrix)
    for i in range(n):
        A[i][i] = A[i][i] + ridge

    rows = [A[i] + [f[i]] for i in range(n)]       # each: n+1 lane vectors
    for k in range(n):
        piv = rows[k]
        piv_mag = jnp.abs(piv[k])
        for i in range(k + 1, n):
            mag_i = jnp.abs(rows[i][k])
            take = mag_i > piv_mag
            new_i = [jnp.where(take, piv[c], rows[i][c]) for c in range(n + 1)]
            piv = [jnp.where(take, rows[i][c], piv[c]) for c in range(n + 1)]
            piv_mag = jnp.maximum(piv_mag, mag_i)
            rows[i] = new_i
        rows[k] = piv
        inv_pivot = 1.0 / _safe_denom(piv[k])
        for i in range(k + 1, n):
            factor = rows[i][k] * inv_pivot
            rows[i] = [rows[i][c] - factor * piv[c] for c in range(n + 1)]

    # back substitution; diagonal clamped sign-preservingly so an exactly
    # singular combined metric yields finite (guarded) output, not Inf/NaN
    # (matches ops/linalg.lu_solve_unrolled, the semantics oracle)
    x = [None] * n
    for i in reversed(range(n)):
        s = rows[i][n]
        for j in range(i + 1, n):
            s = s - rows[i][j] * x[j]
        x[i] = s / _safe_denom(rows[i][i])
    return x


def _kernel(J_ref, W_ref, v_ref, out_ref, *, n: int, ridge: float):
    # refs: J, W (n, R, LANES); v (R, LANES); out (n, LANES)
    # Gram matrix + rhs: every A[i][j]/f[i] is a (LANES,) env-vector
    A = [[None] * n for _ in range(n)]
    f = [None] * n
    for i in range(n):
        Ji = J_ref[i, :, :]                        # (R, LANES)
        f[i] = jnp.sum(Ji * v_ref[:, :], axis=0)
        for j in range(n):
            A[i][j] = jnp.sum(Ji * W_ref[j, :, :], axis=0)

    x = _lu_solve_lanes(A, f, n, ridge)
    for i in range(n):
        out_ref[i, :] = x[i]


def _kernel_blocks(*refs, n: int, ridge: float, n_blocks: int):
    """Multi-block variant: refs = (J_1..J_P, W_1..W_P, v_1..v_P, out).

    Accumulates the Gram matrix/rhs across per-policy row blocks INSIDE the
    kernel, so the producers never materialize the row-concatenated J/W/v
    (two (B, R, n) concatenates measured 7.6% of device time per tick)."""
    out_ref = refs[-1]
    J_refs = refs[0:n_blocks]
    W_refs = refs[n_blocks:2 * n_blocks]
    v_refs = refs[2 * n_blocks:3 * n_blocks]
    A = [[None] * n for _ in range(n)]
    f = [None] * n
    for b in range(n_blocks):
        Jr, Wr, vr = J_refs[b], W_refs[b], v_refs[b]
        for i in range(n):
            Ji = Jr[i, :, :]                       # (R_b, LANES)
            fi = jnp.sum(Ji * vr[:, :], axis=0)
            f[i] = fi if f[i] is None else f[i] + fi
            for j in range(n):
                a = jnp.sum(Ji * Wr[j, :, :], axis=0)
                A[i][j] = a if A[i][j] is None else A[i][j] + a

    x = _lu_solve_lanes(A, f, n, ridge)
    for i in range(n):
        out_ref[i, :] = x[i]


@functools.partial(jax.jit, static_argnames=("ridge",))
def pullback_resolve(J: Array, W: Array, v: Array,
                     ridge: float = 1e-6) -> Array:
    """q̈ = (J^T W + ridge I)^{-1} J^T v for a batch of environments.

    J, W: (B, R, n); v: (B, R) -> (B, n). B must be a multiple of 128
    (pad the env batch); R, n are small static dims (R ~ 100, n ~ 9).
    """
    B, R, n = J.shape
    # batch-on-lanes layout
    Jt = jnp.transpose(J, (2, 1, 0))      # (n, R, B)
    Wt = jnp.transpose(W, (2, 1, 0))
    vt = jnp.transpose(v, (1, 0))         # (R, B)
    return pullback_resolve_t(Jt, Wt, vt, ridge=ridge)


@functools.partial(jax.jit, static_argnames=("ridge",))
def pullback_resolve_t(Jt: Array, Wt: Array, vt: Array,
                       ridge: float = 1e-6) -> Array:
    """Transposed-input variant: Jt, Wt (n, R, B); vt (R, B) -> (B, n).

    Lets producers emit batch-minor layouts directly (e.g. vmap with
    out_axes=-1) so no standalone transpose pass touches the ~30 MB of rows.
    """
    n, R, B = Jt.shape
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"

    grid = (B // LANES,)
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, ridge=ridge),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, R, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, R, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
    )(Jt, Wt, vt)
    return jnp.transpose(out, (1, 0))     # (B, n)


def _kernel_structured(*refs, n: int, ridge: float, tags: tuple):
    """Structure-aware variant: per-block refs laid out tag-by-tag.

    refs order: for each tag in `tags` — 'identity0': (A0, f0) [the
    PRE-SUMMED identity contribution]; 'scalar': (J, m, v); 'dense':
    (J, W, v) — then the out ref. Identity blocks seed the Gram
    accumulators directly (A += M, f += v: J is I_n so no rows exist);
    scalar blocks form W = m * J in VMEM and exploit the symmetry of
    J^T diag(m) J (upper triangle + mirror, ~45% fewer reductions)."""
    out_ref = refs[-1]
    A = [[None] * n for _ in range(n)]
    f = [None] * n

    def add(acc, val):
        return val if acc is None else acc + val

    def ld(x):
        # upcast-on-load: with bf16 block inputs (block_dtype below) the
        # HBM->VMEM stream is half-width; all arithmetic and the Gram
        # accumulators stay f32 (one VPU convert per element)
        return x.astype(jnp.float32)

    r = 0
    for tag in tags:
        if tag == "identity0":
            A0_ref, f0_ref = refs[r], refs[r + 1]
            r += 2
            for i in range(n):
                f[i] = add(f[i], ld(f0_ref[i, :]))
                for j in range(n):
                    A[i][j] = add(A[i][j], ld(A0_ref[i, j, :]))
        elif tag == "scalar":
            J_ref, m_ref, v_ref = refs[r], refs[r + 1], refs[r + 2]
            r += 3
            m = ld(m_ref[:, :])                      # (R, LANES)
            v = ld(v_ref[:, :])
            Ji = [ld(J_ref[i, :, :]) for i in range(n)]
            for i in range(n):
                f[i] = add(f[i], jnp.sum(Ji[i] * v, axis=0))
                Jmi = Ji[i] * m
                for j in range(i, n):
                    a = jnp.sum(Jmi * Ji[j], axis=0)
                    A[i][j] = add(A[i][j], a)
                    if j > i:
                        A[j][i] = add(A[j][i], a)
        else:                                        # dense
            J_ref, W_ref, v_ref = refs[r], refs[r + 1], refs[r + 2]
            r += 3
            v = ld(v_ref[:, :])
            for i in range(n):
                Ji = ld(J_ref[i, :, :])
                f[i] = add(f[i], jnp.sum(Ji * v, axis=0))
                for j in range(n):
                    A[i][j] = add(A[i][j], jnp.sum(Ji * ld(W_ref[j, :, :]),
                                                   axis=0))

    x = _lu_solve_lanes(A, f, n, ridge)
    for i in range(n):
        out_ref[i, :] = x[i]


def pullback_resolve_structured(tags, blocks, ridge: float = 0.0,
                                block_dtype=None) -> Array:
    """q̈ from structured per-policy blocks (core.policy_row_blocks_structured
    with a leading batch axis on every array).

    tags[i]/blocks[i]:
      'identity': (M (B, n, n), v (B, n))
      'scalar':   (J (B, R, n), m (B, R), v (B, R))
      'dense':    (J (B, R, n), W (B, R, n), v (B, R))

    All identity blocks are summed OUTSIDE the kernel (XLA fuses the adds
    into the producers) into one (A0, f0) seed; scalar blocks never
    materialize W = m * J to HBM. vs the unstructured 3-identity +
    1-scalar + 1-dense flagship layout this roughly halves the kernel's
    HBM input traffic.

    block_dtype (e.g. jnp.bfloat16): cast the row blocks to this dtype on
    the producer side — the cast fuses into the producer fusions, so both
    the HBM write and the kernel's read stream halve; the kernel upcasts
    on load and keeps ALL arithmetic + the LU resolve in f32. Opt-in
    reduced precision for the bandwidth-bound flagship regime (~0.4% rel
    row error -> ~1% qdd error; trajectory-parity consumers keep None)."""
    first = blocks[0][0]
    B = first.shape[0]
    n = blocks[0][0].shape[-1] if tags[0] != "identity" else first.shape[-1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"

    A0 = f0 = None
    rest_tags, rest = [], []
    for tag, blk in zip(tags, blocks):
        if tag == "identity":
            M, v = blk
            A0 = M if A0 is None else A0 + M
            f0 = v if f0 is None else f0 + v
        else:
            rest_tags.append(tag)
            rest.append(blk)
    if block_dtype is not None:
        cast = lambda x: x.astype(block_dtype)   # noqa: E731
        if A0 is not None:
            A0, f0 = cast(A0), cast(f0)
        rest = [tuple(cast(x) for x in blk) for blk in rest]

    kernel_tags, inputs, in_specs = [], [], []

    def mat_spec(Rb):
        return pl.BlockSpec((n, Rb, LANES), lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)

    def vec_spec(Rb):
        return pl.BlockSpec((Rb, LANES), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    if A0 is not None:
        kernel_tags.append("identity0")
        inputs += [jnp.transpose(A0, (1, 2, 0)),     # (n, n, B)
                   jnp.transpose(f0, (1, 0))]        # (n, B)
        in_specs += [mat_spec(n), vec_spec(n)]
    for tag, blk in zip(rest_tags, rest):
        kernel_tags.append(tag)
        if tag == "scalar":
            J, m, v = blk
            Rb = J.shape[1]
            inputs += [jnp.transpose(J, (2, 1, 0)), jnp.transpose(m, (1, 0)),
                       jnp.transpose(v, (1, 0))]
            in_specs += [mat_spec(Rb), vec_spec(Rb), vec_spec(Rb)]
        else:
            J, W, v = blk
            Rb = J.shape[1]
            inputs += [jnp.transpose(J, (2, 1, 0)),
                       jnp.transpose(W, (2, 1, 0)), jnp.transpose(v, (1, 0))]
            in_specs += [mat_spec(Rb), mat_spec(Rb), vec_spec(Rb)]

    out = pl.pallas_call(
        functools.partial(_kernel_structured, n=n, ridge=ridge,
                          tags=tuple(kernel_tags)),
        grid=(B // LANES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
    )(*inputs)
    return jnp.transpose(out, (1, 0))     # (B, n)


@functools.partial(jax.jit, static_argnames=("ridge",))
def pullback_resolve_blocks(J_blocks, W_blocks, v_blocks,
                            ridge: float = 0.0) -> Array:
    """Per-policy row-block variant: q̈ = (Σ_b J_b^T W_b + ridge I)^{-1}
    Σ_b J_b^T v_b.

    J_blocks/W_blocks: sequences of (B, R_b, n); v_blocks: (B, R_b).
    The Gram accumulation runs across blocks inside ONE kernel, so callers
    never concatenate rows (the two (B, R, n) concatenates cost 7.6% of the
    flagship tick's device time). B must be a multiple of 128.
    """
    B, _, n = J_blocks[0].shape
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    P = len(J_blocks)
    Jt = [jnp.transpose(Jb, (2, 1, 0)) for Jb in J_blocks]   # (n, R_b, B)
    Wt = [jnp.transpose(Wb, (2, 1, 0)) for Wb in W_blocks]
    vt = [jnp.transpose(vb, (1, 0)) for vb in v_blocks]      # (R_b, B)

    def mat_spec(Rb):
        return pl.BlockSpec((n, Rb, LANES), lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)

    def vec_spec(Rb):
        return pl.BlockSpec((Rb, LANES), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_blocks, n=n, ridge=ridge, n_blocks=P),
        grid=(B // LANES,),
        in_specs=([mat_spec(Jb.shape[1]) for Jb in Jt]
                  + [mat_spec(Wb.shape[1]) for Wb in Wt]
                  + [vec_spec(vb.shape[0]) for vb in vt]),
        out_specs=pl.BlockSpec((n, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
    )(*Jt, *Wt, *vt)
    return jnp.transpose(out, (1, 0))     # (B, n)
