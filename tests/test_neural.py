"""Learned (MLP) RMP leaves: PSD metric by construction, env integration,
and end-to-end training through the differentiable rollout.

(Beyond-reference capability — the reference's policies are fixed closed
forms, rmp.py:226-382 / rmp2.py:31-226, and PyBullet blocks autodiff.)
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from rmp_tpu.policies import neural


def test_metric_is_psd_and_symmetric():
    """Any net output — trained or random garbage — yields a symmetric PSD
    metric (Cholesky head), so the combined pullback stays resolvable."""
    key = jax.random.PRNGKey(0)
    net = neural.mlp_init(key, (6, 16, neural.head_sizes(3)))
    pol = neural.neural_attractor(goal=[0.5, -0.5, 0.1],
                                  taskmap=None, net=net)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 3)) * 3.0
    xd = jax.random.normal(jax.random.PRNGKey(2), (7, 3)) * 5.0
    a, M = pol.evaluate(x, xd)
    assert a.shape == (7, 3) and M.shape == (7, 3, 3)
    np.testing.assert_allclose(np.asarray(M), np.asarray(
        jnp.swapaxes(M, -1, -2)), atol=1e-6)
    eigs = np.linalg.eigvalsh(np.asarray(M))
    assert eigs.min() > 0.0, f"metric not PD: min eig {eigs.min()}"
    # accel bounded by the tanh head
    assert float(jnp.max(jnp.abs(a))) <= float(pol.params["accel_scale"])


def test_head_width_validation():
    net = neural.mlp_init(jax.random.PRNGKey(0), (6, 16, 5))  # wrong width
    with pytest.raises(ValueError, match="head_sizes"):
        neural.neural_attractor(goal=[0.0, 0.0, 0.0], taskmap=None, net=net)


def test_neural_env_rollout_finite():
    """The neural attractor runs inside the standard batched rollout
    machinery (bind_goal, fused aux, resolve) with finite outputs."""
    from rmp_tpu import envs as envs_mod
    from rmp_tpu.envs.neural_reach import make_neural_env

    env = make_neural_env(jax.random.PRNGKey(3))
    states = envs_mod.make_batched_reset(env, 4)(jax.random.PRNGKey(0))
    final, aux = jax.jit(envs_mod.make_batched_rollout(env, 3))(
        states, env.gather_params())
    assert np.all(np.isfinite(np.asarray(final.sim.q)))
    assert np.all(np.isfinite(np.asarray(aux["qdd"])))


def test_trained_asset_scenario_reaches():
    """The registered two_joint/neural_reach scenario (committed trained
    weights) reaches well inside the goal box on UNSEEN random goals —
    the net generalizes over its goal-conditioned input, it didn't
    memorize the training episodes. The committed weights measure 0.9 mm
    mean / 17 mm p99 on 256 unseen goals (99.2% solved at the 2 cm
    tolerance); 5 cm mean is ~50x headroom that still fails hard if the
    asset regresses."""
    from rmp_tpu import envs as envs_mod

    env = envs_mod.make("two_joint/neural_reach")
    states = envs_mod.make_batched_reset(env, 32)(jax.random.PRNGKey(7))
    final, aux = jax.jit(envs_mod.make_batched_rollout(env, 80))(
        states, env.gather_params())
    d = np.linalg.norm(np.asarray(aux["ee"][:, -1, :2])
                       - np.asarray(final.sim.goal[:, :2]), axis=-1)
    assert np.all(np.isfinite(d))
    assert d.mean() < 0.05, f"trained policy regressed: mean dist {d.mean()}"


def test_trained_franka_asset_scenario_reaches():
    """franka/neural_reach (committed weights, trained ON the TPU): the
    9-DoF learned attractor reaches unseen cylindrical-distribution goals.
    Committed net measures 6.8 mm mean / 92% solved at 2 cm on 1024 unseen
    goals at 120 ticks; 0.1 m mean over 16 goals is wide headroom (the
    hand-designed v1 yardstick sits at 0.28 m) that still fails hard on
    asset regression."""
    from rmp_tpu import envs as envs_mod

    env = envs_mod.make("franka/neural_reach")
    states = envs_mod.make_batched_reset(env, 16)(jax.random.PRNGKey(11))
    final, aux = jax.jit(envs_mod.make_batched_rollout(env, 60))(
        states, env.gather_params())
    d = np.linalg.norm(np.asarray(aux["ee"][:, -1])
                       - np.asarray(final.sim.goal), axis=-1)
    assert np.all(np.isfinite(d))
    assert d.mean() < 0.1, f"trained franka policy regressed: {d.mean()}"


def test_neural_obstacle_locality_psd_and_mask():
    """The learned obstacle leaf keeps the hand-designed leaf's structural
    guarantees regardless of net weights: metric EXACTLY zero beyond the
    support radius (far field stays the attractor's), positive within,
    tanh-bounded accel, and ctx-mask zeroing for padded pairs."""
    net = neural.mlp_init(jax.random.PRNGKey(0),
                          (neural.OBSTACLE_FEATURES, 16, 2))
    pol = neural.neural_obstacle(taskmap=None, net=net, support_radius=0.5)
    x = jnp.linspace(-0.1, 1.2, 14)[:, None]          # (P, 1) distances
    xd = jax.random.normal(jax.random.PRNGKey(1), (14, 1))
    a, M = pol.evaluate(x, xd)
    assert a.shape == (14, 1) and M.shape == (14, 1, 1)
    m = np.asarray(M)[:, 0, 0]
    far = np.asarray(x)[:, 0] > 0.5
    assert np.all(m[far] == 0.0), "metric leaks beyond the support radius"
    assert np.all(m[~far] > 0.0), "metric not positive inside support"
    # accel bounded by tanh * the structural near-contact authority boost
    a_cap = float(pol.params["accel_scale"]) * (
        1.0 + float(pol.params["repulsion_boost"]))
    assert float(jnp.max(jnp.abs(a))) <= a_cap
    # the boost decays within ~repulsion_sigma: beyond 0.1 m the plain
    # tanh bound holds
    far_a = np.asarray(x)[:, 0] > 0.1
    assert float(jnp.max(jnp.abs(a[far_a]))) \
        <= float(pol.params["accel_scale"]) * 1.01
    # ctx mask kills padded pairs
    a2, M2 = pol.evaluate(x, xd, ctx={"mask": jnp.zeros(14)})
    assert np.all(np.asarray(M2) == 0.0)


def test_neural_obstacle_width_validation():
    bad_in = neural.mlp_init(jax.random.PRNGKey(0), (5, 8, 2))
    with pytest.raises(ValueError, match="OBSTACLE_FEATURES"):
        neural.neural_obstacle(taskmap=None, net=bad_in)
    bad_out = neural.mlp_init(jax.random.PRNGKey(0),
                              (neural.OBSTACLE_FEATURES, 8, 3))
    with pytest.raises(ValueError, match="output width"):
        neural.neural_obstacle(taskmap=None, net=bad_out)


def test_neural_clutter_env_rollout_and_grad():
    """The learned obstacle leaf runs inside the full randomized-cluttered
    machinery (grouped distance taskmap, ctx mask, fused batched rollout),
    the training aux carries the per-pair distance matrix (Env.aux_fn),
    and gradients flow back to the net through the physics."""
    from rmp_tpu import envs as envs_mod
    from rmp_tpu.envs.neural_clutter import make_neural_clutter_env

    env = make_neural_clutter_env(jax.random.PRNGKey(2), train=True)
    states = envs_mod.make_batched_reset(env, 3)(jax.random.PRNGKey(0))
    rollout = jax.jit(envs_mod.make_batched_rollout(env, 3, remat=True))
    params = env.gather_params()
    final, aux = rollout(states, params)
    L = len(env.model.collision_frames)
    K = states.sim.obstacles.count
    assert aux["obst_d"].shape == (3, 3, L, K)
    assert np.all(np.isfinite(np.asarray(final.sim.q)))

    def loss(net):
        p = params[:-1] + (dict(params[-1], net=net),)
        f, a = rollout(states, p)
        reach = jnp.mean(jnp.linalg.norm(
            a["ee"] - f.sim.goal[:, None, :], axis=-1))
        return reach + jnp.mean(jnp.maximum(0.05 - a["obst_d"], 0.0) ** 2)

    g = jax.grad(loss)(params[-1]["net"])
    gn = float(jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0.0, gn


@pytest.mark.slow
def test_training_descends_and_beats_init():
    """A few Adam steps through the physics strictly improve the rollout
    loss and the mean final EE-goal distance."""
    import optax

    from experiments.train_neural_rmp import make_loss, make_neural_env

    env = make_neural_env(jax.random.PRNGKey(0))
    loss, metrics, _states, base = make_loss(env, batch=32, n_ticks=25)
    net = base[0]["net"]
    m0 = jax.jit(lambda n: metrics(n)[1])(net)
    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(3e-3)
    opt_state = opt.init(net)
    v_first = None
    for _ in range(25):
        v, g = vg(net)
        v_first = float(v) if v_first is None else v_first
        updates, opt_state = opt.update(g, opt_state)
        net = optax.apply_updates(net, updates)
    v_last = float(vg(net)[0])
    m1 = jax.jit(lambda n: metrics(n)[1])(net)
    assert v_last < 0.8 * v_first, (v_first, v_last)
    assert float(m1["mean_final_dist"]) < float(m0["mean_final_dist"])


@pytest.mark.slow
def test_trainer_checkpoint_resume_equivalence(tmp_path, monkeypatch):
    """A training run interrupted by --stop-after and resumed with --resume
    produces the SAME weights as the uninterrupted run: the checkpoint
    carries the optimizer state (schedule step count included), the best
    iterate, and the loop position."""
    from experiments import train_neural_rmp as trainer

    straight = tmp_path / "straight.npz"
    resumed = tmp_path / "resumed.npz"
    ckpt = tmp_path / "train.ckpt"
    common = ["train_neural_rmp.py", "--batch", "4", "--ticks", "4",
              "--steps", "4", "--hidden", "6", "--seed", "0"]

    monkeypatch.setattr(sys, "argv", common + ["--save", str(straight)])
    trainer.main()
    monkeypatch.setattr(sys, "argv", common + ["--ckpt", str(ckpt),
                                               "--stop-after", "2"])
    trainer.main()
    assert ckpt.exists()
    monkeypatch.setattr(sys, "argv", common + ["--ckpt", str(ckpt),
                                               "--resume",
                                               "--save", str(resumed)])
    trainer.main()

    a, b = np.load(straight), np.load(resumed)
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=1e-7, err_msg=k)


@pytest.mark.slow
def test_trained_clutter_asset_behaves():
    """franka/neural_clutter (committed learned obstacle leaf, barrier
    variant) on unseen randomized scenes: reaches like the hand-designed
    stack and keeps collisions near the spawn floor. Committed asset
    measures (4096 envs x 300 ticks, TPU): success 92.1% / final
    penetration 1.5% vs the hand leaf's 92.9% / 1.0%. Here: 32 unseen
    episodes x 100 ticks without resampling — mean final distance under
    0.3 m (trained: 0.084) and ever-penetrated rate under 0.6 (trained:
    0.24 against a 0.21 deep-penetration-spawn floor) fail hard on asset
    regression while tolerating CPU-batch noise."""
    from rmp_tpu import envs as envs_mod
    from rmp_tpu.envs.neural_clutter import clearance_aux
    import dataclasses

    env = dataclasses.replace(envs_mod.make("franka/neural_clutter"),
                              on_solved=None, stuck_fn=None,
                              aux_fn=clearance_aux)
    states = envs_mod.make_batched_reset(env, 32)(jax.random.PRNGKey(123))
    final, aux = jax.jit(envs_mod.make_batched_rollout(env, 100))(
        states, env.gather_params())
    d = np.linalg.norm(np.asarray(aux["ee"][:, -1])
                       - np.asarray(final.sim.goal), axis=-1)
    assert np.all(np.isfinite(d))
    assert d.mean() < 0.3, f"trained clutter policy regressed: {d.mean()}"
    ever_pen = (np.asarray(aux["obst_d"]).min(axis=(-2, -1)).min(axis=-1)
                < -0.01).mean()
    assert ever_pen < 0.6, f"collision behavior regressed: {ever_pen}"
