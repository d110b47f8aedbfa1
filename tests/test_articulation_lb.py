"""Link-batched substep (sim/articulation_lb.py) vs the unrolled engine.

The lb formulation must match articulation.articulation_substep — forward
AND gradients — on every joint-type family: prismatic+revolute (CartPole),
free+revolute+ground contacts (Ant), free root + hinges (TinyHumanoid),
ball joints + muscles (TinySNU). It exists purely as a faster schedule for
the launch-bound backward pass, so any numeric divergence is a bug.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffrl_tpu.envs as envs
from diffrl_tpu.sim import articulation as art
from diffrl_tpu.sim.articulation_lb import simulate_batched_lb, substep_lb
from diffrl_tpu.sim.model import State

from test_envs import TinyHumanoidEnv, TinySNUEnv


def _make(name, E):
    if name == "TinyHumanoid":
        return TinyHumanoidEnv(num_envs=E, seed=0, stochastic_init=True)
    if name == "TinySNU":
        return TinySNUEnv(num_envs=E, seed=0, stochastic_init=True)
    return envs.make(name, num_envs=E, seed=0, stochastic_init=True)


def _rand_batch(env, E, key):
    """Settled-ish random state + controls, env-leading layout."""
    ks = jax.random.split(key, 4)
    state = env.reset(jax.random.PRNGKey(0))
    q = state.joint_q + 0.01 * jax.random.normal(
        ks[0], state.joint_q.shape)
    qd = 0.3 * jax.random.normal(ks[1], state.joint_qd.shape)
    D = env.model.dof_count
    ja = 0.5 * jax.random.normal(ks[2], (E, D))
    M = env.model.topology.muscle_count
    ma = (0.5 + 0.4 * jax.random.uniform(ks[3], (E, M))) if M else None
    return q, qd, ja, ma


def _refresh(model, q, qd, ja, ma, h):
    """H / Hinv from the unrolled refresh, env-minor [D, D, E]."""
    def one(q1, qd1, ja1, ma1):
        _, _, (H, Hinv) = art.articulation_substep(
            model, q1, qd1, ja1, ma1, h)
        return H, Hinv

    if ma is None:
        H, Hinv = jax.vmap(lambda a, b, c: one(a, b, c, None))(q, qd, ja)
    else:
        H, Hinv = jax.vmap(one)(q, qd, ja, ma)
    return jnp.moveaxis(H, 0, -1), jnp.moveaxis(Hinv, 0, -1)


ENVS = ["CartPoleSwingUp", "Ant", "TinyHumanoid", "TinySNU"]


@pytest.mark.parametrize("name", ENVS)
def test_substep_lb_matches_unrolled(name):
    E = 4
    env = _make(name, E)
    model = env.model
    h = env.dt / env.sim_substeps
    q, qd, ja, ma = _rand_batch(env, E, jax.random.PRNGKey(1))
    H, Hinv = _refresh(model, q, qd, ja, ma, h)

    q_lb, qd_lb = jax.jit(
        lambda *a: substep_lb(model, *a, dt=h, H=H, Hinv=Hinv)
    )(q.T, qd.T, ja.T, None if ma is None else ma.T)

    def one(q1, qd1, ja1, ma1, H1, Hinv1):
        qn, qdn, _ = art.articulation_substep(
            model, q1, qd1, ja1, ma1, h,
            mass_cache=(H1, Hinv1))
        return qn, qdn

    if ma is None:
        ref = jax.vmap(lambda a, b, c, d, e: one(a, b, c, None, d, e))
        args = (q, qd, ja, jnp.moveaxis(H, -1, 0), jnp.moveaxis(Hinv, -1, 0))
    else:
        ref = jax.vmap(one)
        args = (q, qd, ja, ma, jnp.moveaxis(H, -1, 0),
                jnp.moveaxis(Hinv, -1, 0))
    q_ref, qd_ref = jax.jit(ref)(*args)

    np.testing.assert_allclose(
        np.asarray(q_lb.T), np.asarray(q_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(qd_lb.T), np.asarray(qd_ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", ENVS)
def test_substep_lb_vjp_matches_unrolled(name):
    E = 3
    env = _make(name, E)
    model = env.model
    h = env.dt / env.sim_substeps
    q, qd, ja, ma = _rand_batch(env, E, jax.random.PRNGKey(2))
    H, Hinv = _refresh(model, q, qd, ja, ma, h)
    has_m = ma is not None

    kc = jax.random.split(jax.random.PRNGKey(3), 2)
    gq = jax.random.normal(kc[0], q.shape)
    gqd = jax.random.normal(kc[1], qd.shape)

    def lb_fn(q_t, qd_t, ja_t, ma_t, H_t):
        return substep_lb(model, q_t, qd_t, ja_t,
                          ma_t if has_m else None, h, H_t, Hinv)

    _, vjp_lb = jax.vjp(
        lb_fn, q.T, qd.T, ja.T,
        ma.T if has_m else jnp.zeros((0, E)), H)
    d_lb = vjp_lb((gq.T, gqd.T))

    def ref_fn(q_b, qd_b, ja_b, ma_b, H_b):
        def one(q1, qd1, ja1, ma1, H1, Hinv1):
            qn, qdn, _ = art.articulation_substep(
                model, q1, qd1, ja1, ma1 if has_m else None, h,
                mass_cache=(H1, Hinv1))
            return qn, qdn
        return jax.vmap(one)(
            q_b, qd_b, ja_b, ma_b, H_b, jnp.moveaxis(Hinv, -1, 0))

    _, vjp_ref = jax.vjp(
        ref_fn, q, qd, ja,
        ma if has_m else jnp.zeros((E, 0)), jnp.moveaxis(H, -1, 0))
    d_ref = vjp_ref((gq, gqd))

    labels = ["dq", "dqd", "dja", "dma", "dH"]
    for lab, a, b in zip(labels, d_lb, d_ref):
        if lab == "dma" and not has_m:
            continue
        if lab == "dH":
            b = jnp.moveaxis(b, 0, -1)
        else:
            b = b.T
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"{name}: {lab} mismatch")


@pytest.mark.parametrize("name", ENVS)
def test_refresh_substep_lb_matches_unrolled(name):
    """Factorizing substep: the link-batched CRBA refresh
    (refresh_substep_lb / _mass_matrix_em) == the unrolled
    articulation_substep with mass_cache=None — state, H, Hinv, and VJP."""
    from diffrl_tpu.sim.articulation_lb import refresh_substep_lb

    E = 3
    env = _make(name, E)
    model = env.model
    h = env.dt / env.sim_substeps
    q, qd, ja, ma = _rand_batch(env, E, jax.random.PRNGKey(8))
    has_m = ma is not None

    def lb_fn(q_t, qd_t, ja_t, ma_t):
        qn, qdn, H, Hinv = refresh_substep_lb(
            model, q_t, qd_t, ja_t, ma_t if has_m else None, h)
        return qn, qdn, H

    def ref_fn(q_b, qd_b, ja_b, ma_b):
        def one(q1, qd1, ja1, ma1):
            qn, qdn, (H, Hinv) = art.articulation_substep(
                model, q1, qd1, ja1, ma1 if has_m else None, h)
            return qn, qdn, H
        return jax.vmap(one)(q_b, qd_b, ja_b, ma_b)

    ma_in = ma.T if has_m else jnp.zeros((0, E))
    ma_ref = ma if has_m else jnp.zeros((E, 0))
    out_lb = jax.jit(lb_fn)(q.T, qd.T, ja.T, ma_in)
    out_ref = jax.jit(ref_fn)(q, qd, ja, ma_ref)
    for lab, a, b, (rt, at) in [
        ("q", out_lb[0].T, out_ref[0], (2e-5, 1e-6)),
        ("qd", out_lb[1].T, out_ref[1], (2e-5, 2e-5)),
        ("H", jnp.moveaxis(out_lb[2], -1, 0), out_ref[2], (2e-5, 1e-4)),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rt, atol=at,
            err_msg=f"{name}: refresh {lab} mismatch")

    # VJP: cotangents on (q', qd', H) -> grads on every input
    kc = jax.random.split(jax.random.PRNGKey(9), 3)
    gq = jax.random.normal(kc[0], q.shape)
    gqd = jax.random.normal(kc[1], qd.shape)
    gH = 0.01 * jax.random.normal(
        kc[2], (E, model.dof_count, model.dof_count))

    _, vjp_lb = jax.vjp(lb_fn, q.T, qd.T, ja.T, ma_in)
    d_lb = vjp_lb((gq.T, gqd.T, jnp.moveaxis(gH, 0, -1)))
    _, vjp_ref = jax.vjp(ref_fn, q, qd, ja, ma_ref)
    d_ref = vjp_ref((gq, gqd, gH))
    # tolerance note: H matches to f32 round-off (~1e-8 relative), but the
    # frozen-inverse solve amplifies constant-rounding differences between
    # the CRBA and pairwise H assemblies through Hinv*tau (verified in f64:
    # the residual tracks the primal qd' difference, not the VJP structure)
    for lab, a, b in zip(["dq", "dqd", "dja", "dma"], d_lb, d_ref):
        if lab == "dma" and not has_m:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b.T), rtol=2e-3, atol=1e-3,
            err_msg=f"{name}: refresh vjp {lab} mismatch")


@pytest.mark.parametrize("name", ["CartPoleSwingUp", "Ant"])
def test_simulate_batched_lb_matches_manual(name):
    """Full env-step window: lb whole-batch simulate == simulate(manual),
    forward and end-to-end gradient.

    Runs in a FRESH subprocess (tests/_lb_window_check.py): loading these
    two window-grad executables from the persistent compile cache after
    the suite's earlier in-process compilations segfaults XLA:CPU 0.9.0
    inside compilation_cache.get_executable_and_time, while a fresh
    process loads the identical entries fine (see the script docstring).
    """
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "_lb_window_check.py")
    proc = subprocess.run(
        [sys.executable, script, name],
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0 and "LB_WINDOW_CHECK_PASS" in proc.stdout, (
        f"lb window check subprocess failed (rc={proc.returncode}):\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
