"""Stage-by-stage profiling of the flagship control tick (TPU).

Decomposes the franka/06 control step: sense, RMP evaluation (split into
taskmap-differentiation / policy-eval+pullback / resolve), physics substeps.

CAVEAT — these are UPPER BOUNDS, not a partition: each stage is timed as a
STANDALONE jit, so it materializes outputs that the fused rollout never
writes to HBM, and shared producers (FK, sense) are re-run in several rows.
Stages therefore don't add up to the full tick. For honest per-op/per-line
attribution inside the real fused rollout use
    python experiments/trace_report.py [--by-source]
which aggregates device time from a jax.profiler trace.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from rmp_tpu import envs
from rmp_tpu.core import evaluate_policies, resolve
from rmp_tpu.envs.base import make_control_step
from rmp_tpu.models import kinematics as K
from rmp_tpu.sim.world import physics_step, sense
from rmp_tpu.utils.profiling import time_jitted

B = 4096
env = envs.make("franka/06_cluttered_environment")
env.resolve_method = "cholesky"
model = env.model
policies = env.policies
params = env.gather_params()

states = envs.make_batched_reset(env, B)(jax.random.PRNGKey(0))
sims = states.sim


print("standalone-jit stage timings (UPPER BOUNDS — see module docstring; "
      "use trace_report.py for in-rollout attribution)\n")


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    compile_s, run_s = time_jitted(jfn, *args, iters=20)
    print(f"{name:34s} compile {compile_s:7.1f}s   run {run_s*1e3:8.3f} ms "
          f"({run_s*1e9/B:8.1f} ns/env)")
    return run_s


# 1. sense (fk_all + 70 capsule queries + context assembly)
def do_sense(sim):
    q, qd, ctx = sense(model, sim)
    return jax.tree.leaves(ctx)[0]
t_sense = bench("sense", jax.vmap(do_sense), sims)


# 2. full RMP evaluation
def do_eval(sim):
    q, qd, ctx = sense(model, sim)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None for p in policies)
    return evaluate_policies(policies, q, qd, params, ctxs, method="cholesky")
t_eval = bench("sense + RMP evaluate (chol/ana)", jax.vmap(do_eval), sims)


def do_eval_jf(sim):
    q, qd, ctx = sense(model, sim)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None for p in policies)
    return evaluate_policies(policies, q, qd, params, ctxs, method="cholesky",
                             derivatives="jacfwd")
bench("sense + RMP evaluate (jacfwd)", jax.vmap(do_eval_jf), sims)


from rmp_tpu.models.fk_derivatives import fk_derivatives
def do_fkd(sim):
    return fk_derivatives(model, sim.q, sim.qd)
bench("fk_derivatives (analytic)", jax.vmap(do_fkd), sims)


from rmp_tpu.core import _taskmap_derivatives_analytic
def do_tder(sim):
    q, qd, ctx = sense(model, sim)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None for p in policies)
    x, xd, J, c = _taskmap_derivatives_analytic(policies, q, qd, ctxs)
    return J
bench("sense + taskmap deriv (analytic)", jax.vmap(do_tder), sims)


# 3. taskmap differentiation alone (the stacked jacfwd)
def _unused_do_diff(sim):
    q, qd, ctx = sense(model, sim)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None for p in policies)

    def stacked(qq):
        T16 = K.fk_all(model, qq).reshape(-1, 16)
        outs = []
        for p, c in zip(policies, ctxs):
            tm = p.taskmap
            if getattr(tm, "fk_rooted", False):
                outs.append(tm.post(T16[tm.frame_idx][None, :], c))
            else:
                outs.append(tm(qq, c))
        return tuple(outs)

    x, xd = jax.jvp(stacked, (q,), (qd,))
    J = jax.jacfwd(stacked)(q)
    _, c_all = jax.jvp(lambda qq: jax.jvp(stacked, (qq,), (qd,))[1], (q,), (qd,))
    return x[0], J[0], c_all[0]



# 4. resolve alone on random PSD systems
key = jax.random.PRNGKey(1)
Jr = jax.random.normal(key, (B, 30, 9), jnp.float32)
A = jnp.einsum("bri,brj->bij", Jr, Jr) + 0.1 * jnp.eye(9)
f = jax.random.normal(key, (B, 9), jnp.float32)
bench("resolve: cholesky", jax.vmap(lambda a, b: resolve(a, b, "cholesky")), A, f)


# 5. physics substeps (10x)
def do_phys(sim, qdd):
    def sub(s, _):
        return physics_step(model, s, qdd, 0.01), None
    s, _ = jax.lax.scan(sub, sim, None, length=10)
    return s.q
qdd0 = jnp.zeros((B, model.n_q), jnp.float32)
t_phys = bench("physics substeps x10", jax.vmap(do_phys), sims, qdd0)


# 6. full control tick
step = make_control_step(env)
t_full = bench("FULL control tick",
               jax.vmap(lambda s: step(s, params)[0].sim.q), states)
print(f"\nfull tick {t_full*1e3:.2f} ms -> {B/t_full:,.0f} control steps/s")
