"""Standalone lb-vs-manual window check, run in a FRESH process.

Invoked by tests/test_articulation_lb.py::test_simulate_batched_lb_matches_manual
via subprocess rather than in-process: loading these two window-grad
executables from the persistent compile cache after the suite's earlier
compilations segfaults XLA:CPU 0.9.0 inside
``compilation_cache.get_executable_and_time`` (deserialization bug —
reproducible at the same test in two full-suite runs, while a fresh
process loads the identical cache entries fine). The subprocess boundary
sidesteps the corrupted in-process state without giving up either the
coverage or the cache.

Usage: python _lb_window_check.py <CartPoleSwingUp|Ant>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=avx2").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import diffrl_tpu.envs as envs
from diffrl_tpu.sim import articulation as art
from diffrl_tpu.sim.articulation_lb import simulate_batched_lb
from diffrl_tpu.sim.model import State


def _rand_batch(env, E, key):
    ks = jax.random.split(key, 4)
    state = env.reset(jax.random.PRNGKey(0))
    q = state.joint_q + 0.01 * jax.random.normal(ks[0], state.joint_q.shape)
    qd = 0.3 * jax.random.normal(ks[1], state.joint_qd.shape)
    D = env.model.dof_count
    ja = 0.5 * jax.random.normal(ks[2], (E, D))
    M = env.model.topology.muscle_count
    ma = (0.5 + 0.4 * jax.random.uniform(ks[3], (E, M))) if M else None
    return q, qd, ja, ma


def main(name: str) -> None:
    E = 4
    env = envs.make(name, num_envs=E, seed=0, stochastic_init=True)
    model = env.model
    q, qd, ja, ma = _rand_batch(env, E, jax.random.PRNGKey(4))
    substeps, mm = 8, 4

    def run_lb(q, qd, ja):
        qn, qdn = simulate_batched_lb(
            model, q, qd, ja, ma, dt=env.dt,
            substeps=substeps, mass_matrix_freq=mm)
        return qn, qdn

    def run_manual(q, qd, ja):
        def one(q1, qd1, ja1, ma1):
            s = art.simulate(
                model, State(joint_q=q1, joint_qd=qd1), joint_act=ja1,
                muscle_act=ma1, dt=env.dt, substeps=substeps,
                mass_matrix_freq=mm, backward="manual")
            return s.joint_q, s.joint_qd
        if ma is None:
            return jax.vmap(lambda a, b, c: one(a, b, c, None))(q, qd, ja)
        return jax.vmap(one)(q, qd, ja, ma)

    q_lb, qd_lb = jax.jit(run_lb)(q, qd, ja)
    q_m, qd_m = jax.jit(run_manual)(q, qd, ja)
    np.testing.assert_allclose(np.asarray(q_lb), np.asarray(q_m),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qd_lb), np.asarray(qd_m),
                               rtol=1e-4, atol=1e-4)

    w_q = jax.random.normal(jax.random.PRNGKey(5), q.shape)
    w_qd = jax.random.normal(jax.random.PRNGKey(6), qd.shape)

    def loss(fn):
        def f(q, qd, ja):
            qn, qdn = fn(q, qd, ja)
            return jnp.sum(qn * w_q) + jnp.sum(qdn * w_qd)
        return f

    g_lb = jax.jit(jax.grad(loss(run_lb), argnums=(0, 1, 2)))(q, qd, ja)
    g_m = jax.jit(jax.grad(loss(run_manual), argnums=(0, 1, 2)))(q, qd, ja)
    for lab, a, b in zip(["dq", "dqd", "dja"], g_lb, g_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f"{name}: window grad {lab} mismatch")

    # residual-saving reverse (reverse="residual" / sim_backward="lb_ad"):
    # plain XLA autodiff through the lb scan must match the replay VJP.
    # CartPole only: the residual-mode window grad has a much larger jaxpr
    # (every substep's intermediates become scan residuals) and the Ant
    # variant alone adds >10 min of 1-core CPU compile to the suite; the
    # mode is topology-independent, so the small scene covers it.
    if name == "CartPoleSwingUp":
        def run_lb_ad(q, qd, ja):
            return simulate_batched_lb(
                model, q, qd, ja, ma, dt=env.dt,
                substeps=substeps, mass_matrix_freq=mm, reverse="residual")

        g_ad = jax.jit(jax.grad(loss(run_lb_ad), argnums=(0, 1, 2)))(q, qd, ja)
        for lab, a, b in zip(["dq", "dqd", "dja"], g_ad, g_lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"{name}: lb_ad window grad {lab} mismatch")
    print(f"LB_WINDOW_CHECK_PASS {name}")


if __name__ == "__main__":
    main(sys.argv[1])
