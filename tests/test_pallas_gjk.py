"""Fused Pallas GJK kernel (ops/pallas_gjk.py) vs the XLA path oracle.

The production integration (TPU, fused batched rollout) is oracle-checked
on hardware in experiments (kernel vs ops/gjk p99 < 5e-6 m, small
overestimate tail bounded by the 10-iteration convergence band). Here we
verify what runs on CPU:

  * the lane-array Johnson port is EXACT vs ops/gjk._johnson;
  * the batched wrapper + ctx plumbing is equivalent to the per-env path
    (CPU routes through the XLA implementation via platform_dependent);
  * the kernel in interpret mode agrees with the XLA path at the
    quantile level. NOTE interpret mode shows a rare gross-disagreement
    tail that does NOT reproduce on real TPU hardware (hardware vs XLA
    p99 3e-6, all large residuals are small overestimates) nor when the
    kernel body is invoked directly — an interpret-executor artifact, so
    the tolerance here is quantile-based.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.models.hulls import hulls_for
from rmp_tpu.ops import gjk
from rmp_tpu.ops import pallas_gjk as pg
from rmp_tpu.sim import collision as C
from rmp_tpu.sim import randomizer as rnd


def test_johnson_lanes_matches_oracle():
    rng = np.random.default_rng(0)
    Y = rng.normal(size=(4000, 4, 3)).astype(np.float32)
    Y[::7, 1] = Y[::7, 0]           # degenerate duplicate slots
    Y[::11, 2] = Y[::11, 3]
    for newest in (True, False):
        x_ref, lam_ref = gjk._johnson(jnp.asarray(Y), newest_only=newest)
        y = [tuple(jnp.asarray(Y[:, i, c].reshape(40, 100))
                   for c in range(3)) for i in range(4)]
        x_l, lam_l = pg._johnson_lanes(y, newest_only=newest)
        x_l = np.stack([np.asarray(c).reshape(-1) for c in x_l], -1)
        lam_l = np.stack([np.asarray(c).reshape(-1) for c in lam_l], -1)
        np.testing.assert_allclose(x_l, np.asarray(x_ref), atol=1e-5)
        np.testing.assert_allclose(lam_l, np.asarray(lam_ref), atol=1e-5)


@pytest.fixture(scope="module")
def randomized_batch():
    model = robots.franka_panda()
    if hulls_for(model) is None:
        pytest.skip("no panda hull asset")
    B = 128
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def sample(key):
        k1, k2 = jax.random.split(key)
        obs = rnd.randomize_obstacles(k1, 2)
        q, _ = rnd.randomize_robot_config(k2)
        return q, obs

    qs, obss = jax.vmap(sample)(keys)
    T_all_b = jax.vmap(lambda q: K.fk_all(model, q))(qs)
    return model, T_all_b, obss


@pytest.mark.slow
def test_kernel_interpret_agrees_at_quantiles(randomized_batch):
    model, T_all_b, obss = randomized_batch
    ref = jax.vmap(lambda T, o: C.robot_obstacle_distances_hull(
        model, T, o))(T_all_b, obss)
    got = C.robot_obstacle_distances_hull_batched(model, T_all_b, obss,
                                                  interpret=True)
    d_ref = np.asarray(ref[3])
    d_got = np.asarray(got[3])
    diff = np.abs(d_got - d_ref)
    assert np.percentile(diff, 99) < 1e-4
    assert np.median(diff) < 1e-6
    assert (diff > 1e-3).mean() < 0.01      # interpret-artifact tail bound
    # witnesses consistent with distances where the paths agree, outside
    # the hybrid capsule-handoff regime (there pa/pb are capsule witnesses
    # and dist is the min-merged signed distance — |pa-pb| != dist by
    # design near/inside contact)
    agree = (diff < 1e-5) & (d_got > 1e-3)
    pa, pb = np.asarray(got[0]), np.asarray(got[1])
    wd = np.linalg.norm(pa - pb, axis=-1)
    np.testing.assert_allclose(wd[agree], d_got[agree], atol=1e-4)


@pytest.mark.slow
def test_kernel_mxu_support_matches_vpu(randomized_batch, monkeypatch):
    """The RMP_GJK_MXU support-reduce reformulation (a measured perf dead
    end on the v5e, kept as the documented negative result — see the note
    in ops/pallas_gjk._kernel) must stay numerically equivalent to the
    default VPU reduce: same supports up to fp reordering, so distances
    agree to ~1e-5 and witnesses to ~1e-3."""
    model, T_all_b, obss = randomized_batch
    # a pre-exported RMP_GJK_MXU in the dev/CI env would make the baseline
    # call MXU too and the comparison vacuous
    monkeypatch.delenv("RMP_GJK_MXU", raising=False)
    got_vpu = C.robot_obstacle_distances_hull_batched(model, T_all_b, obss,
                                                      interpret=True)
    monkeypatch.setenv("RMP_GJK_MXU", "1")
    got_mxu = C.robot_obstacle_distances_hull_batched(model, T_all_b, obss,
                                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got_mxu[3]),
                               np.asarray(got_vpu[3]), atol=1e-4)
    for a, b in zip(got_mxu[:2], got_vpu[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_kernel_vjp_envelope_gradient(randomized_batch):
    """VERDICT r4 #5: the fused kernel's custom_vjp (envelope-theorem rule,
    ops/pallas_gjk._gjk_bwd) must give the exact a.e. distance gradient
    w.r.t. q through FK — checked against (a) the autodiff-through-
    iterations XLA hull path and (b) central finite differences. Pairs in
    the capsule-handoff band are masked out (there the output IS the
    capsule result by design)."""
    model, T_all_b, obss = randomized_batch
    qs = None  # rebuild q from the fixture's sampler for grad input
    keys = jax.random.split(jax.random.PRNGKey(0), 128)

    def sample_q(key):
        _, k2 = jax.random.split(key)
        q, _ = rnd.randomize_robot_config(k2)
        return q

    qs = jax.vmap(sample_q)(keys)
    K_obs = obss.count

    # smooth loss over distances; mask pairs near the hybrid handoff or
    # near feature transitions (envelope rule is a.e. exact)
    pl0, po0, n0, d0, _ = C.robot_obstacle_distances_hull_batched(
        model, T_all_b, obss, interpret=True, top_m=K_obs)
    mask = jnp.asarray(np.asarray(d0) > 5e-3, jnp.float32)

    # jit both losses: production consumers are always jitted, and in
    # interpret mode the eager-traced kernel can break a support TIE
    # differently from the jitted one (the executor artifact in the module
    # docstring), shifting the a.e. gradient at kink coordinates.
    @jax.jit
    def loss_kernel(q_b):
        T = jax.vmap(lambda q: K.fk_all(model, q))(q_b)
        _, _, _, d, _ = C.robot_obstacle_distances_hull_batched(
            model, T, obss, interpret=True, top_m=K_obs)
        return jnp.sum(jnp.exp(-4.0 * d) * mask)

    @jax.jit
    def loss_xla(q_b):
        T = jax.vmap(lambda q: K.fk_all(model, q))(q_b)
        _, _, _, d = jax.vmap(lambda Tb, o: C.robot_obstacle_distances_hull(
            model, Tb, o))(T, obss)
        return jnp.sum(jnp.exp(-4.0 * d) * mask)

    g_kernel = np.asarray(jax.grad(loss_kernel)(qs))
    g_xla = np.asarray(jax.grad(loss_xla)(qs))
    # global agreement: cosine + norm ratio (per-coordinate comparison is
    # polluted by tie-breaking differences between the two support reduces)
    cos = (g_kernel * g_xla).sum() / (
        np.linalg.norm(g_kernel) * np.linalg.norm(g_xla) + 1e-30)
    assert cos > 0.999, cos
    ratio = np.linalg.norm(g_kernel) / (np.linalg.norm(g_xla) + 1e-30)
    assert 0.98 < ratio < 1.02, ratio

    # central finite differences on the kernel path, a few coordinates.
    # Envs are independent, so d(global loss)/dq[b, j] equals the
    # derivative of env b's own term — FD the PER-ENV loss (restrict the
    # mask to env b) to avoid fp32 cancellation against the ~100-unit
    # global sum (at h=3e-3 that noise floor is ~0.3 slope units, larger
    # than the tolerance).
    @jax.jit
    def loss_env(q_b, env_mask):
        T = jax.vmap(lambda q: K.fk_all(model, q))(q_b)
        _, _, _, d, _ = C.robot_obstacle_distances_hull_batched(
            model, T, obss, interpret=True, top_m=K_obs)
        return jnp.sum(jnp.exp(-4.0 * d) * mask * env_mask)
    rng = np.random.default_rng(1)
    h = 3e-3
    checked = 0
    for _ in range(6):
        b = int(rng.integers(0, qs.shape[0]))
        j = int(rng.integers(0, 7))
        e = np.zeros(qs.shape, np.float32)
        e[b, j] = h
        em = np.zeros(mask.shape[:1] + (1,) * (mask.ndim - 1), np.float32)
        em[b] = 1.0
        em = jnp.asarray(np.broadcast_to(em, mask.shape))
        fd = (float(loss_env(qs + e, em))
              - float(loss_env(qs - e, em))) / (2 * h)
        an = float(g_kernel[b, j])
        if abs(fd) < 1e-3:
            continue        # flat coordinate: FD noise dominates
        assert abs(an - fd) < 0.08 * abs(fd) + 1e-3, (b, j, an, fd)
        checked += 1
    assert checked >= 3


@pytest.mark.slow
def test_batched_hull_step_matches_per_env_on_cpu():
    """The fused batched step's PRE-VMAP hull context (distance_context_
    batched + in_axes plumbing) must give the same rollout as the per-env
    path — on CPU both route to the XLA query, so this isolates the
    batching/ctx plumbing from the kernel itself."""
    from rmp_tpu import envs
    from rmp_tpu.envs import base as eb

    env = envs.make("franka/06_cluttered_environment")
    if hulls_for(env.model) is None:
        pytest.skip("no panda hull asset")
    env.collision_geometry = "hull"
    env.resolve_method = "solve"
    B = 128
    states = envs.make_batched_reset(env, B)(jax.random.PRNGKey(0))
    params = env.gather_params()
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        s1, aux1 = eb.make_batched_control_step(env)(states, params)
        s2, aux2 = jax.vmap(eb.make_control_step(env),
                            in_axes=(0, None))(states, params)
    np.testing.assert_allclose(np.asarray(aux1["qdd"]),
                               np.asarray(aux2["qdd"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.sim.q), np.asarray(s2.sim.q),
                               atol=1e-5)


def test_gjk_warm_seed_is_converged_witness():
    """make_batched_reset must seed the hull tier's gjk_warm carry with
    CONVERGED witness directions (pos_on_obstacle - pos_on_link of a cold
    10-iteration query), not zeros: a zero seed made tick 0 run the warm
    iteration count from the capsule-witness start, below the measured
    accuracy band (round-3 review finding)."""
    from rmp_tpu import envs
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.data import PAIRS_KEY, distance_context_batched

    env = envs.make("franka/06_cluttered_environment")
    if hulls_for(env.model) is None:
        pytest.skip("no panda hull asset")
    env.collision_geometry = "hull"
    B = 128
    states = envs.make_batched_reset(env, B)(jax.random.PRNGKey(3))
    warm = states.gjk_warm
    assert warm is not None
    assert np.all(np.isfinite(np.asarray(warm)))
    assert np.any(np.abs(np.asarray(warm)) > 1e-6)      # not the zero seed
    T_all_b = jax.vmap(lambda q: K.fk_all(env.model, q))(states.sim.q)
    ctx, _ = distance_context_batched(env.model, T_all_b,
                                      states.sim.obstacles,
                                      geometry="hull", iters=10)
    pairs = ctx[PAIRS_KEY]
    np.testing.assert_allclose(
        np.asarray(warm),
        np.asarray(pairs["pos_on_obstacle"] - pairs["pos_on_link"]),
        atol=1e-6)
