"""Coupled particle <-> articulation regression test.

The coupled pipeline (sim/articulation.py:coupled_substep) feeds soft
contacts the CURRENT substep's body transforms — a documented deviation
from the reference's previous-substep cached state — so no reference
fixture can pin it. Instead this fixed-seed rollout is pinned against a
committed self-regression fixture (tests/fixtures/coupled_regression.npz,
regenerate with tools/gen_coupled_fixture.py after intentional physics
changes)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.sim.articulation import simulate
from diffrl_tpu.sim.model import ModelBuilder

_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "coupled_regression.npz"
)

REVOLUTE = 1
QI = (0.0, 0.0, 0.0, 1.0)


def build_coupled_scene():
    """2-link capsule pendulum with a 3x3 particle grid dropped onto it."""
    b = ModelBuilder()
    b.add_articulation()
    l0 = b.add_link(-1, np.array([0.0, 1.0, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE, damping=0.1)
    b.add_shape_capsule(l0, pos=(0.3, 0.0, 0.0), radius=0.08, half_width=0.3,
                        density=800.0, ke=1.0e4, kd=100.0, kf=100.0, mu=0.5)
    l1 = b.add_link(l0, np.array([0.6, 0.0, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE, damping=0.1)
    b.add_shape_capsule(l1, pos=(0.3, 0.0, 0.0), radius=0.08, half_width=0.3,
                        density=800.0, ke=1.0e4, kd=100.0, kf=100.0, mu=0.5)
    b.joint_q[0] = 0.15
    b.joint_q[1] = -0.1

    for ix in range(3):
        for iz in range(3):
            b.add_particle(
                (0.2 + 0.2 * ix, 1.35, -0.1 + 0.1 * iz), (0.0, 0.0, 0.0), 0.1
            )

    model = b.finalize()
    return dataclasses.replace(
        model, ground=True,
        contact_ke=1.0e4, contact_kd=100.0, contact_kf=100.0, contact_mu=0.5,
    )


def rollout_coupled(steps=40, substeps=4, record_every=5):
    model = build_coupled_scene()
    state = model.state()
    step = jax.jit(lambda s: simulate(model, s, dt=1.0 / 60.0,
                                      substeps=substeps,
                                      mass_matrix_freq=substeps))
    qs, pqs = [], []
    for i in range(steps):
        state = step(state)
        if (i + 1) % record_every == 0:
            qs.append(np.asarray(state.joint_q))
            pqs.append(np.asarray(state.particle_q))
    return dict(joint_q=np.stack(qs), particle_q=np.stack(pqs))


@pytest.mark.skipif(not os.path.exists(_FIXTURE),
                    reason="run tools/gen_coupled_fixture.py first")
def test_coupled_regression():
    ref = np.load(_FIXTURE)
    got = rollout_coupled()
    for k in ("joint_q", "particle_q"):
        assert np.all(np.isfinite(got[k])), f"non-finite {k}"
        np.testing.assert_allclose(
            got[k], ref[k], atol=2e-5, rtol=0.0,
            err_msg=f"{k} diverged from the committed coupled fixture",
        )


def test_coupled_two_way_transfer():
    """Falling particles must push the pendulum (two-way coupling): the
    joint trajectory with particles differs from the particle-free one."""
    model = build_coupled_scene()
    state = model.state()
    # particle-free twin: same articulation, no particles
    no_p = dataclasses.replace(
        state, particle_q=None, particle_qd=None
    )
    m_no_p = dataclasses.replace(model, particle_q_init=None)
    step_p = jax.jit(lambda s: simulate(model, s, dt=1.0 / 60.0, substeps=4,
                                        mass_matrix_freq=4))
    step_n = jax.jit(lambda s: simulate(m_no_p, s, dt=1.0 / 60.0, substeps=4,
                                        mass_matrix_freq=4))
    for _ in range(40):
        state = step_p(state)
        no_p = step_n(no_p)
    dq = float(jnp.max(jnp.abs(state.joint_q - no_p.joint_q)))
    assert np.isfinite(dq)
    assert dq > 1e-3, "particles exert no force on the articulation"
