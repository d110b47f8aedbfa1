"""Fused Pallas substep path == hand-written manual path, values and grads.

The pallas backend (sim/pallas_substep.py + articulation.simulate_batched_pallas)
runs each cached substep — forward and VJP — as one fused kernel per env
tile. On CPU the kernels execute in interpreter mode, so these tests verify
the tiling/padding/closure-conversion plumbing and the custom_vjp wiring on
small topologies; Ant-scale parity is exercised by tools/bench_backward.py
on hardware. Reference analog: the generated fused CUDA kernel pair per op
(/root/reference/dflex/dflex/adjoint.py codegen).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.sim import simulate
from diffrl_tpu.sim.articulation import simulate_batched_pallas
from diffrl_tpu.sim.model import ModelBuilder, State
from diffrl_tpu.sim.model import JOINT_REVOLUTE as REVOLUTE

QI = (0.0, 0.0, 0.0, 1.0)


def _finalize(b, ground, **kw):
    m = b.finalize()
    return dataclasses.replace(
        m, ground=ground, gravity=jnp.array([0.0, -9.81, 0.0]), **kw)


def _pendulum_ground():
    b = ModelBuilder()
    b.add_articulation()
    l0 = b.add_link(-1, np.array([0.0, 0.4, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE, limit_lower=-0.5, limit_upper=0.5,
                    limit_ke=20.0, limit_kd=2.0, stiffness=3.0, damping=0.5)
    b.add_shape_capsule(l0, pos=(0.3, 0.0, 0.0), radius=0.08, half_width=0.3,
                        density=500.0, ke=100.0, kd=10.0, kf=10.0, mu=0.5)
    return _finalize(b, ground=True, contact_ke=100.0, contact_kd=10.0,
                     contact_kf=10.0, contact_mu=0.5)


def _two_link_muscle():
    b = ModelBuilder()
    b.add_articulation()
    l0 = b.add_link(-1, np.array([0.0, 1.0, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_capsule(l0, pos=(0.25, 0.0, 0.0), radius=0.05,
                        half_width=0.25, density=500.0)
    l1 = b.add_link(l0, np.array([0.5, 0.0, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_capsule(l1, pos=(0.25, 0.0, 0.0), radius=0.05,
                        half_width=0.25, density=500.0)
    b.add_muscle([l0, l1], [np.array([0.05, 0.05, 0.0]),
                            np.array([0.2, 0.05, 0.0])],
                 f0=10.0, lm=0.3, lt=0.1, lmax=0.5, pen=0.0)
    return _finalize(b, ground=False)


def _ref_batched(m, substeps, mm):
    def fn(q, qd, ja, ma):
        def one(q1, qd1, ja1, ma1):
            s = simulate(m, State(joint_q=q1, joint_qd=qd1), joint_act=ja1,
                         muscle_act=ma1, dt=1 / 60, substeps=substeps,
                         mass_matrix_freq=mm, backward="manual")
            return s.joint_q, s.joint_qd

        if ma is None:
            return jax.vmap(lambda a, b, c: one(a, b, c, None))(q, qd, ja)
        return jax.vmap(one)(q, qd, ja, ma)

    return fn


def _pal_batched(m, substeps, mm):
    def fn(q, qd, ja, ma):
        return simulate_batched_pallas(m, q, qd, ja, ma, dt=1 / 60,
                                       substeps=substeps,
                                       mass_matrix_freq=mm)

    return fn


def _check(m, q, qd, ja, ma, substeps, mm):
    ref = _ref_batched(m, substeps, mm)
    pal = _pal_batched(m, substeps, mm)

    rq, rqd = ref(q, qd, ja, ma)
    pq, pqd = pal(q, qd, ja, ma)
    np.testing.assert_allclose(np.asarray(pq), np.asarray(rq),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pqd), np.asarray(rqd),
                               rtol=2e-6, atol=2e-5)

    w1 = jnp.cos(jnp.arange(rq.shape[-1], dtype=jnp.float32))

    def loss_of(fn):
        has_m = ma is not None
        argnums = (0, 1, 2, 3) if has_m else (0, 1, 2)

        def L(*args):
            a, b = fn(*args, *(() if has_m else (None,)))
            return jnp.sum(a * w1) + 0.5 * jnp.sum(b ** 2)

        args = (q, qd, ja, ma) if has_m else (q, qd, ja)
        return jax.grad(L, argnums=argnums)(*args)

    for name, a, b in zip(("dq", "dqd", "dja", "dma"),
                          loss_of(pal), loss_of(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_pallas_matches_manual_pendulum_contacts():
    """Contacts + joint limits + stiffness/damping through 4 substeps with
    mm_freq 2 (refresh + cached-kernel mix), values and all input grads."""
    m = _pendulum_ground()
    E = 3
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.uniform(-1.3, -1.1, (E, 1)).astype(np.float32))
    qd = jnp.asarray(rs.uniform(-0.5, 0.5, (E, 1)).astype(np.float32))
    ja = jnp.asarray(rs.uniform(-0.5, 0.5, (E, 1)).astype(np.float32))
    _check(m, q, qd, ja, None, substeps=4, mm=2)


def test_pallas_matches_manual_muscles():
    """Muscle-activation cotangents through the fused kernel path."""
    m = _two_link_muscle()
    E = 2
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.uniform(-0.4, 0.4, (E, 2)).astype(np.float32))
    qd = jnp.asarray(rs.uniform(-0.2, 0.2, (E, 2)).astype(np.float32))
    ja = jnp.asarray(rs.uniform(-0.5, 0.5, (E, 2)).astype(np.float32))
    ma = jnp.asarray(rs.uniform(0.1, 0.9, (E, 1)).astype(np.float32))
    _check(m, q, qd, ja, ma, substeps=4, mm=2)


def test_pallas_env_step_branch():
    """env.step(sim_backward='pallas') runs end-to-end and matches the
    default backend's next state."""
    import diffrl_tpu.envs as envs

    kw = dict(num_envs=2, seed=0, stochastic_init=False,
              episode_length=100, early_termination=False)
    env_p = envs.make("CartPoleSwingUp", sim_backward="pallas", **kw)
    env_r = envs.make("CartPoleSwingUp", **kw)
    s0p = env_p.reset(jax.random.PRNGKey(0))
    s0r = env_r.reset(jax.random.PRNGKey(0))
    a = jnp.full((2, env_p.num_acts), 0.3, jnp.float32)
    sp, op, rp, dp, _ = env_p.step(s0p, a)
    sr, orr, rr, dr, _ = env_r.step(s0r, a)
    np.testing.assert_allclose(np.asarray(sp.joint_q),
                               np.asarray(sr.joint_q), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(op), np.asarray(orr),
                               rtol=2e-5, atol=2e-5)
