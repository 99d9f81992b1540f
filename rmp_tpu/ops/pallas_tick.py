"""Pallas TPU mega-kernel: the ENTIRE RMP evaluation in one kernel.

For the v2 policy-stack family used by the flagship scenes (franka 05/06 and
the randomized sweeps: TargetAttractor on the EE position + JointVelocityCap
+ JointDamping [+ CSpaceBiasing] + one grouped ObstacleAvoidance over all
collision links x obstacles), this kernel computes per 512-env block:

  1. the FK twist-generator recursion (T, velocity operators W, generators G
     — constant-sparsity 4x4 codegen shared with ops/pallas_fk.py),
  2. position/velocity/Jacobian/curvature of the EE and of every collision
     frame origin (analytic: J_p[:, j] = (G_j t̃)_xyz, c_p = ((Ẇ+W²) t̃)_xyz),
  3. capsule-capsule closest points vs the per-env obstacle set,
  4. the distance-taskmap derivatives in closed form (frozen-offset trick:
     ∂d/∂q = n̂ᵀ J_p;  c_d = n̂ᵀ c_p + (|ṗ|² − (n̂ᵀṗ)²)/d),
  5. every policy's (a, M) and its pullback contribution into A = Σ JᵀMJ,
     f = Σ JᵀM(a−c) — identity policies add M directly, the 1-D distance
     rows add m·J_dᵀJ_d outer products,
  6. the unrolled Cholesky resolve,

and writes ONLY q̈ (n x B) — total HBM traffic per tick collapses from
~40 MB of intermediates to the kilobytes of (q, q̇, obstacles, goal) in and
q̈ out.

STATUS: EXPERIMENTAL — a measured negative result, kept as documentation
and as the base for further scheduling work. The kernel is numerically
correct (cross-checked against the standard path in interpret mode,
tests/test_pallas_tick.py) but the compiled Mosaic kernel runs ~30x SLOWER
than the XLA-fusion path it replaces (25 ms vs 0.8 ms per 4096-env tick):
the body is ~20k mutually-dependent (8,128) vector ops (serial FK chain,
unrolled Cholesky) and Mosaic schedules them far less effectively than
XLA's fused elementwise kernels, which additionally overlap independent
fusion groups. The production path therefore remains
envs.make_batched_control_step (XLA evaluation + the small fused
pallas_resolve kernel). Not wired into any env.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmp_tpu.models.urdf import FIXED, ROOT, KinematicModel
from rmp_tpu.ops.pallas_fk import (_add, _const44, _generator_E, _is_const,
                                   _axis_rotation, _madd44, _mm44, _msub44,
                                   _mul, _rigid_inv, _scale44)

Array = jax.Array

SUBLANES = 8
LANES = 128
BLOCK = SUBLANES * LANES


def _full(v):
    return jnp.full((SUBLANES, LANES), float(v), jnp.float32)


def _arr(v):
    return _full(v) if _is_const(v) else v


def _dot3(a, b):
    return _add(_add(_mul(a[0], b[0]), _mul(a[1], b[1])), _mul(a[2], b[2]))


def _v3(op, a, b):
    return [op(a[i], b[i]) for i in range(3)]


def _transform_point(T, p):
    """T (4x4 entries) applied to constant/vector 3-point."""
    return [_add(functools.reduce(_add, (_mul(T[i][k], p[k])
                                         for k in range(3))), T[i][3])
            for i in range(3)]


def _seg_closest(a0, a1, b0, b1):
    """Clamped closest-point parameters between segments (lane-vector math);
    mirrors sim/collision.segment_closest_params."""
    EPS = 1e-9
    d1 = _v3(lambda x, y: _add(x, _mul(-1.0, y)), a1, a0)
    d2 = _v3(lambda x, y: _add(x, _mul(-1.0, y)), b1, b0)
    r = _v3(lambda x, y: _add(x, _mul(-1.0, y)), a0, b0)
    a = _dot3(d1, d1)
    e = _dot3(d2, d2)
    f = _dot3(d2, r)
    c = _dot3(d1, r)
    b = _dot3(d1, d2)
    a_, e_, f_, c_, b_ = (_arr(x) for x in (a, e, f, c, b))
    denom = a_ * e_ - b_ * b_
    s = jnp.where(denom > EPS, (b_ * f_ - c_ * e_) / (denom + EPS), 0.0)
    s = jnp.where(e_ > EPS, s, -c_ / (a_ + EPS))
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e_ > EPS, (b_ * s + f_) / (e_ + EPS), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where((t != t_cl) & (a_ > EPS),
                  jnp.clip((t_cl * b_ - c_) / (a_ + EPS), 0.0, 1.0), s)
    return s, t_cl, d1, d2


def supports(env) -> bool:
    """Whether this env's policy stack matches the fused-kernel template."""
    from rmp_tpu.policies import v2
    kinds = []
    for p in env.policies:
        fn = p.accel_metric
        if fn is v2._attractor_accel_metric:
            tm = p.taskmap
            if not (getattr(tm, "fk_rooted", False)
                    and isinstance(tm.frame_idx, int)):
                return False
            kinds.append("attractor")
        elif fn is v2._velocity_cap_accel_metric:
            kinds.append("velcap")
        elif fn is v2._joint_damping_accel_metric:
            kinds.append("damping")
        elif fn is v2._cspace_biasing_accel_metric:
            kinds.append("cspace")
        elif fn is v2._obstacle_accel_metric:
            tm = p.taskmap
            if not (getattr(tm, "fk_rooted", False)
                    and isinstance(tm.frame_idx, tuple)):
                return False
            kinds.append("obstacle")
        else:
            return False
    return "attractor" in kinds and "obstacle" in kinds


def _make_kernel(model: KinematicModel, env, ridge: float):
    from rmp_tpu.policies import v2

    n = model.n_q
    F = model.n_frames
    policies = env.policies
    attractor = next(p for p in policies
                     if p.accel_metric is v2._attractor_accel_metric)
    obstacle_pol = next(p for p in policies
                        if p.accel_metric is v2._obstacle_accel_metric)
    ee_frame = attractor.taskmap.frame_idx
    col_frames = obstacle_pol.taskmap.frame_idx          # tuple of ints
    caps_local = [(model.collision[f][0].p0, model.collision[f][0].p1,
                   model.collision[f][0].radius) for f in col_frames]

    ap = attractor.params
    op = obstacle_pol.params
    identity_pols = [p for p in policies
                     if p.accel_metric in (v2._velocity_cap_accel_metric,
                                           v2._joint_damping_accel_metric,
                                           v2._cspace_biasing_accel_metric)]

    def kernel(q_ref, qd_ref, goal_ref, op0_ref, op1_ref, orad_ref, out_ref):
        q = [q_ref[j, 0] for j in range(n)]
        qd = [qd_ref[j, 0] for j in range(n)]
        goal = [goal_ref[i, 0] for i in range(3)]
        K = op0_ref.shape[0]
        obs_p0 = [[op0_ref[k, i, 0] for i in range(3)] for k in range(K)]
        obs_p1 = [[op1_ref[k, i, 0] for i in range(3)] for k in range(K)]
        obs_r = [orad_ref[k, 0] for k in range(K)]

        # ---- FK recursion (shared codegen style with pallas_fk) -----------
        eye = _const44(np.eye(4))
        zero44 = [[0.0] * 4 for _ in range(4)]
        T = [None] * F
        W = [None] * F
        Wd = [None] * F
        G = [None] * F
        for i in range(F):
            par = model.parent[i]
            T_par = eye if par == ROOT else T[par]
            W_par = zero44 if par == ROOT else W[par]
            Wd_par = zero44 if par == ROOT else Wd[par]
            A = _mm44(T_par, _const44(model.T_constant[i]))
            jt = model.joint_type[i]
            qi = model.q_index[i]
            if jt == FIXED:
                T_var = eye
            elif model.joint_type[i] == 0:  # REVOLUTE
                T_var = _axis_rotation(model.axis[i], q[qi])
            else:
                x, y, z = (float(v) for v in model.axis[i])
                T_var = _const44(np.eye(4))
                T_var[0][3] = _mul(x, q[qi])
                T_var[1][3] = _mul(y, q[qi])
                T_var[2][3] = _mul(z, q[qi])
            T[i] = _mm44(A, T_var)
            if jt == FIXED:
                W[i], Wd[i] = W_par, Wd_par
            else:
                Gi = _mm44(_mm44(A, _generator_E(model, i)), _rigid_inv(A))
                G[i] = Gi
                W[i] = _madd44(W_par, _scale44(qd[qi], Gi))
                comm = _msub44(_mm44(W_par, Gi), _mm44(Gi, W_par))
                Wd[i] = _madd44(Wd_par, _scale44(qd[qi], comm))

        def point_derivs(f, p_local=(0.0, 0.0, 0.0)):
            """(p, ṗ, J (3 x n), c) of a body point on frame f (world)."""
            Tf = T[f]
            p_h = _transform_point(Tf, list(p_local)) + [1.0]
            acc = _madd44(Wd[f], _mm44(W[f], W[f]))
            pd = [functools.reduce(_add, (_mul(W[f][i][k], p_h[k])
                                          for k in range(4)))
                  for i in range(3)]
            cv = [functools.reduce(_add, (_mul(acc[i][k], p_h[k])
                                          for k in range(4)))
                  for i in range(3)]
            anc = {model.q_index[j]: j for j in model.chain(f)
                   if model.joint_type[j] != FIXED}
            J = [[functools.reduce(_add, (_mul(G[anc[m]][i][k], p_h[k])
                                          for k in range(4)))
                  if m in anc else 0.0 for m in range(n)] for i in range(3)]
            return p_h[:3], pd, J, cv

        # ---- combined system accumulators ---------------------------------
        A_sys = [[_full(ridge) if i == j else 0.0 for j in range(n)]
                 for i in range(n)]
        f_sys = [0.0] * n

        # ---- attractor (EE position, 3-D task space) ----------------------
        x, xd, Jx, cx = point_derivs(ee_frame)
        delta = [_add(goal[i], _mul(-1.0, x[i])) for i in range(3)]
        dn = jnp.sqrt(jnp.maximum(_arr(_dot3(delta, delta)), 1e-20))
        eps = float(ap["accel_norm_eps"])
        soft = jnp.maximum(dn, eps / 10.0)
        dhat = [_arr(delta[i]) / soft for i in range(3)]
        a_att = [float(ap["accel_p_gain"]) * _arr(delta[i]) / (dn + eps)
                 - float(ap["accel_d_gain"]) * _arr(xd[i]) for i in range(3)]
        scaled = dn / float(ap["metric_alpha_length_scale"])
        min_a = float(ap["min_metric_alpha"])
        alpha = (1.0 - min_a) * jnp.exp(-0.5 * scaled * scaled) + min_a
        bs = dn / float(ap["proximity_metric_boost_length_scale"])
        boost_a = jnp.exp(-0.5 * bs * bs)
        boost = boost_a * float(ap["proximity_metric_boost_scalar"]) \
            + (1.0 - boost_a)
        max_s = float(ap["max_metric_scalar"])
        min_s = float(ap["min_metric_scalar"])
        M_att = [[boost * (alpha * max_s * (1.0 if i == j else 0.0)
                           + (1.0 - alpha) * min_s * dhat[i] * dhat[j])
                  for j in range(3)] for i in range(3)]
        # pullback: u = M (a - c); f += Jᵀ u; A += Jᵀ (M J)
        amc = [_add(a_att[i], _mul(-1.0, cx[i])) for i in range(3)]
        u = [functools.reduce(_add, (_mul(M_att[i][k], amc[k])
                                     for k in range(3))) for i in range(3)]
        W_att = [[functools.reduce(_add, (_mul(M_att[i][k], Jx[k][j])
                                          for k in range(3)))
                  for j in range(n)] for i in range(3)]
        for jcol in range(n):
            f_sys[jcol] = _add(f_sys[jcol],
                               functools.reduce(_add, (
                                   _mul(Jx[k][jcol], u[k]) for k in range(3))))
            for icol in range(jcol, n):
                contrib = functools.reduce(_add, (
                    _mul(Jx[k][icol], W_att[k][jcol]) for k in range(3)))
                A_sys[icol][jcol] = _add(A_sys[icol][jcol], contrib)
                if icol != jcol:
                    A_sys[jcol][icol] = _add(A_sys[jcol][icol], contrib)

        # ---- identity-space policies --------------------------------------
        for pol in identity_pols:
            pp = pol.params
            if pol.accel_metric is v2._velocity_cap_accel_metric:
                region = float(pp["velocity_damping_region"])
                cutoff = float(pp["max_velocity"]) - region
                wgt = float(pp["metric_weight"])
                gain = float(pp["damping_gain"])
                a_vec, m_diag = [], []
                for j in range(n):
                    xdj = qd[j]
                    dv = jnp.abs(xdj) - cutoff
                    aj = -jnp.abs(gain * dv) * jnp.sign(xdj)
                    aj = jnp.where(jnp.abs(xdj) < cutoff, 0.0, aj)
                    ratio = jnp.minimum(dv, region - 1e-6) / region
                    a_vec.append(aj)
                    m_diag.append(wgt / (1.0 - ratio * ratio))
                # M = wgt everywhere + (diag - wgt) on the diagonal
                s_all = functools.reduce(_add, a_vec)
                for i in range(n):
                    f_sys[i] = _add(f_sys[i], _add(
                        _mul(wgt, s_all), (m_diag[i] - wgt) * a_vec[i]))
                    A_sys[i][i] = _add(A_sys[i][i], m_diag[i] - wgt)
                    for j in range(n):
                        A_sys[i][j] = _add(A_sys[i][j], wgt)
            elif pol.accel_metric is v2._joint_damping_accel_metric:
                xdn = jnp.sqrt(jnp.maximum(
                    _arr(functools.reduce(_add, (_mul(qd[j], qd[j])
                                                 for j in range(n)))), 1e-20))
                e = float(pp["metric_scalar"]) * xdn + float(pp["inertia"])
                g = float(pp["accel_d_gain"])
                for j in range(n):
                    f_sys[j] = _add(f_sys[j], e * (-g * xdn * _arr(qd[j])))
                    A_sys[j][j] = _add(A_sys[j][j], e)
            else:  # cspace biasing
                gvec = np.asarray(pp["goal"], dtype=np.float32)
                thresh = float(pp["robust_position_term_thresh"])
                pg = float(pp["position_gain"])
                dg = float(pp["damping_gain"])
                e = float(pp["metric_scalar"]) + float(pp["inertia"])
                xs = [_add(q[j], -float(gvec[j])) for j in range(n)]
                xn = jnp.sqrt(jnp.maximum(
                    _arr(functools.reduce(_add, (_mul(xs[j], xs[j])
                                                 for j in range(n)))), 1e-24))
                for j in range(n):
                    xhat = _arr(xs[j]) / jnp.maximum(xn, 1e-12)
                    a_pos = jnp.where(xn < thresh, -_arr(xs[j]) * pg,
                                      -thresh * xhat * pg)
                    aj = a_pos - dg * _arr(qd[j])
                    f_sys[j] = _add(f_sys[j], e * aj)
                    A_sys[j][j] = _add(A_sys[j][j], e)

        # ---- grouped obstacle avoidance (1-D distance rows) ---------------
        r_mod = float(op["metric_modulation_radius"])
        margin = float(op["margin"])
        for li, f in enumerate(col_frames):
            p0l, p1l, rad = caps_local[li]
            # frame-origin derivatives (the frozen-offset trick anchors the
            # Jacobian at the frame origin, taskmap.py:120-131 semantics)
            porg, pdorg, Jorg, corg = point_derivs(f)
            a0 = _transform_point(T[f], list(p0l))
            a1 = _transform_point(T[f], list(p1l))
            for k in range(K):
                s, t, d1, d2 = _seg_closest(a0, a1, obs_p0[k], obs_p1[k])
                ca = [_arr(a0[i]) + s * _arr(d1[i]) for i in range(3)]
                cb = [_arr(obs_p0[k][i]) + t * _arr(d2[i]) for i in range(3)]
                diff = [ca[i] - cb[i] for i in range(3)]
                cdist = jnp.sqrt(jnp.maximum(
                    diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2],
                    1e-18))
                nvec = [diff[i] / cdist for i in range(3)]
                pos_link = [ca[i] - float(rad) * nvec[i] for i in range(3)]
                pos_obs = [cb[i] + obs_r[k] * nvec[i] for i in range(3)]
                # taskmap output: ||pos_link - pos_obs|| (norm, >= 0)
                h = [pos_link[i] - pos_obs[i] for i in range(3)]
                d_c = jnp.sqrt(jnp.maximum(
                    h[0] * h[0] + h[1] * h[1] + h[2] * h[2], 1e-18))
                nh = [h[i] / d_c for i in range(3)]
                # derivative rows (closed form)
                Jd = [functools.reduce(_add, (
                    _mul(nh[i], Jorg[i][j]) for i in range(3)))
                    for j in range(n)]
                pd_ = [_arr(pdorg[i]) for i in range(3)]
                xd_d = nh[0] * pd_[0] + nh[1] * pd_[1] + nh[2] * pd_[2]
                pd_sq = pd_[0] * pd_[0] + pd_[1] * pd_[1] + pd_[2] * pd_[2]
                c_lin = functools.reduce(_add, (
                    _mul(nh[i], corg[i]) for i in range(3)))
                c_d = _add(c_lin, (pd_sq - xd_d * xd_d) / d_c)
                # policy formulas (v2 ObstacleAvoidance, rmp2.py:183-196)
                xdist = jnp.maximum(d_c - margin, 0.0)
                gate = xdist * xdist / (r_mod * r_mod) - 2.0 * xdist / r_mod + 1.0
                gate = jnp.where(xdist > r_mod, 0.0, gate)
                base = float(op["metric_scalar"]) / (
                    xdist / float(op["metric_exploder_std_dev"])
                    + float(op["metric_exploder_eps"]))
                metric = base * gate
                a_rep = float(op["repulsion_gain"]) * jnp.exp(
                    -xdist / float(op["repulsion_std_dev"]))
                sig = jax.nn.sigmoid(
                    xd_d / float(op["damping_velocity_gate_length_scale"]))
                a_damp = -(1.0 - sig) * float(op["damping_gain"]) * xd_d / (
                    xdist / float(op["damping_std_dev"])
                    + float(op["damping_robustness_eps"]))
                metric = jnp.where(xdist > r_mod, 0.0, (1.0 - sig) * metric)
                amc_d = a_rep + a_damp - _arr(c_d)
                mj = [_mul(metric, _arr(Jd[j])) if not _is_const(Jd[j])
                      else 0.0 for j in range(n)]
                for jcol in range(n):
                    if _is_const(Jd[jcol]):
                        continue
                    f_sys[jcol] = _add(f_sys[jcol],
                                       _arr(Jd[jcol]) * metric * amc_d)
                    for icol in range(jcol, n):
                        if _is_const(Jd[icol]):
                            continue
                        contrib = _arr(Jd[icol]) * mj[jcol]
                        A_sys[icol][jcol] = _add(A_sys[icol][jcol], contrib)
                        if icol != jcol:
                            A_sys[jcol][icol] = _add(A_sys[jcol][icol],
                                                     contrib)

        # ---- unrolled Cholesky resolve -------------------------------------
        Amat = [[_arr(0.5 * (_add(A_sys[i][j], A_sys[j][i])))
                 if not _is_const(A_sys[i][j]) or not _is_const(A_sys[j][i])
                 else _full(A_sys[i][j]) for j in range(n)] for i in range(n)]
        L = [[None] * n for _ in range(n)]
        for j in range(n):
            d = Amat[j][j]
            for k in range(j):
                d = d - L[j][k] * L[j][k]
            Ljj = jnp.sqrt(jnp.maximum(d, 1e-12))
            inv = 1.0 / Ljj
            L[j][j] = Ljj
            for i in range(j + 1, n):
                s = Amat[i][j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s * inv
        y = [None] * n
        for i in range(n):
            s = _arr(f_sys[i])
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        xsol = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * xsol[k]
            xsol[i] = s / L[i][i]
        for i in range(n):
            out_ref[i, 0] = xsol[i]

    return kernel


_CACHE: dict[int, "callable"] = {}


def make_fused_qdd(env, ridge: float = 1e-6):
    """Batched fn(q (B,n), qd (B,n), goal (B,3), obstacles) -> q̈ (B,n)."""
    model = env.model
    n = model.n_q
    kernel = _make_kernel(model, env, ridge)

    @jax.jit
    def run(q, qd, goal, obs_p0, obs_p1, obs_r):
        B = q.shape[0]
        assert B % BLOCK == 0, f"batch {B} must be a multiple of {BLOCK}"
        nb = B // BLOCK
        K = obs_p0.shape[1]

        def tr(x, *lead):   # (B, ...) -> (..., nb, S, LANES)
            perm = tuple(range(1, x.ndim)) + (0,)
            return x.transpose(perm).reshape(*lead, nb, SUBLANES, LANES)

        args = (tr(q, n), tr(qd, n), tr(goal, 3), tr(obs_p0, K, 3),
                tr(obs_p1, K, 3), tr(obs_r, K))
        specs = [
            pl.BlockSpec((n, 1, SUBLANES, LANES), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, SUBLANES, LANES), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, SUBLANES, LANES), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 3, 1, SUBLANES, LANES),
                         lambda b: (0, 0, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 3, 1, SUBLANES, LANES),
                         lambda b: (0, 0, b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, SUBLANES, LANES), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

        def kern(q_ref, qd_ref, goal_ref, p0_ref, p1_ref, r_ref, out_ref):
            class _V:      # drop the singleton block axis for 2-index reads
                def __init__(self, ref, lead):
                    self.ref, self.lead = ref, lead
                    self.shape = ref.shape

                def __getitem__(self, idx):
                    if self.lead == 1:
                        j, _ = idx
                        return self.ref[j, 0]
                    k, i, _ = idx
                    return self.ref[k, i, 0]
            kernel(_V(q_ref, 1), _V(qd_ref, 1), _V(goal_ref, 1),
                   _V(p0_ref, 2), _V(p1_ref, 2), _V(r_ref, 1), out_ref)

        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=specs,
            out_specs=pl.BlockSpec((n, 1, SUBLANES, LANES),
                                   lambda b: (0, b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, nb, SUBLANES, LANES),
                                           jnp.float32),
        )(*args)
        return out.reshape(n, B).T
    return run
