"""Deep gradient verification.

Three layers, mirroring the reference's strategy
(/root/reference/dflex/tests/test_ant.py:390-424 FD-verifies analytic
gradients per action dim through the full robot; adjoint.py:2104-2108 has
per-launch gradcheck):

1. FD-vs-analytic through ONE full contact-rich Ant env step, every
   action dimension (ground contacts active after settling).
2. FD-vs-analytic end-to-end through a 4-step SHAC-style window
   (discounted reward of an action sequence).
3. A ``config.gradcheck`` sweep over every force-kernel family: springs,
   triangles (FEM membrane), bending, tets, particle ground contacts,
   soft contacts, articulation ground contacts, muscles, joint-limit/tau.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu import config
from diffrl_tpu.sim import articulation as art
from diffrl_tpu.sim import particles as part
from diffrl_tpu.sim.model import ModelBuilder

REVOLUTE = 1
QI = (0.0, 0.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# 1+2: full Ant env step / SHAC window
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ant_settled():
    """A 1-env Ant settled onto the ground (contacts active)."""
    from diffrl_tpu.envs.ant import AntEnv

    env = AntEnv(num_envs=1, stochastic_init=False, early_termination=False,
                 MM_caching_frequency=16)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    zero = jnp.zeros((1, env.num_acts), dtype=jnp.float32)
    for _ in range(8):
        state, _, _, _, _ = step(state, zero)
    # contacts really are active: torso settled below the 0.75 drop height
    q = state.joint_q[0]
    assert float(q[1]) < 0.70
    return env, state, step


def test_fd_ant_env_step_all_action_dims(ant_settled):
    """Analytic d(reward)/d(action_j) through one contact-rich env step
    matches central differences for EVERY action dim."""
    env, state, step = ant_settled
    base = jnp.asarray(
        [0.3, -0.2, 0.25, 0.15, -0.3, 0.2, -0.25, 0.35], dtype=jnp.float32
    )[None, :]

    def loss(a):
        _, _, rew, _, _ = step(state, a)
        return rew[0]

    loss_j = jax.jit(loss)
    analytic = np.asarray(jax.jit(jax.grad(loss))(base))[0]

    eps = 1e-2
    for j in range(env.num_acts):
        ap = base.at[0, j].add(eps)
        am = base.at[0, j].add(-eps)
        fd = (float(loss_j(ap)) - float(loss_j(am))) / (2 * eps)
        assert np.isfinite(analytic[j])
        assert abs(analytic[j] - fd) <= 5e-2 * max(1.0, abs(fd)), (
            f"action dim {j}: analytic {analytic[j]:.6f} vs FD {fd:.6f}"
        )


def test_fd_shac_window_ant(ant_settled):
    """End-to-end gradient of a 4-step discounted-reward window w.r.t. the
    whole action sequence (the exact quantity SHAC backprops)."""
    env, state, _ = ant_settled
    H = 4
    gamma = 0.99
    acts = jnp.asarray(
        np.linspace(-0.4, 0.4, H * env.num_acts, dtype=np.float32)
    ).reshape(H, 1, env.num_acts)

    def window_loss(a_seq):
        def body(carry, a):
            s, disc = carry
            s, _, rew, _, _ = env.step(s, a)
            return (s, disc * gamma), disc * rew[0]

        (_, _), rews = jax.lax.scan(body, (state, 1.0), a_seq)
        return jnp.sum(rews)

    loss_j = jax.jit(window_loss)
    analytic = np.asarray(jax.jit(jax.grad(window_loss))(acts))

    assert np.all(np.isfinite(analytic))
    # FD-spot-check a spread of (step, dim) coordinates incl. first/last step
    eps = 1e-2
    coords = [(0, 0), (0, 5), (1, 3), (2, 7), (3, 1), (3, 6)]
    for (t, j) in coords:
        ap = acts.at[t, 0, j].add(eps)
        am = acts.at[t, 0, j].add(-eps)
        fd = (float(loss_j(ap)) - float(loss_j(am))) / (2 * eps)
        got = analytic[t, 0, j]
        assert abs(got - fd) <= 8e-2 * max(1.0, abs(fd)), (
            f"window grad ({t},{j}): analytic {got:.6f} vs FD {fd:.6f}"
        )


# ---------------------------------------------------------------------------
# 3: per-kernel gradcheck sweep
# ---------------------------------------------------------------------------

def _finalize(b, ground=False, **kw):
    return dataclasses.replace(b.finalize(), ground=ground, **kw)


def _weighted(f_out, w_seed=3):
    """Deterministic weighted-sum reduction -> scalar (all outputs count)."""
    w = jnp.asarray(
        np.random.RandomState(w_seed).uniform(0.5, 1.5, np.shape(f_out))
        .astype(np.float32)
    )
    return jnp.sum(f_out * w)


def test_gradcheck_springs():
    b = ModelBuilder()
    b.add_particle((0.0, 0.0, 0.0), (0.1, 0.0, 0.0), 1.0)
    b.add_particle((0.3, 0.1, 0.0), (0.0, -0.1, 0.0), 1.0)
    b.add_particle((0.1, 0.4, 0.1), (0.0, 0.0, 0.2), 1.0)
    b.add_spring(0, 1, ke=50.0, kd=2.0, control=0.0)
    b.add_spring(1, 2, ke=30.0, kd=1.0, control=0.0)
    m = _finalize(b)
    x0, v0 = m.particle_q_init, m.particle_qd_init
    config.gradcheck(lambda x, v: _weighted(part.eval_springs(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(lambda x, v: _weighted(part.eval_springs(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=1)


def _cloth_model():
    b = ModelBuilder()
    b.add_cloth_grid(
        pos=(0.0, 1.0, 0.0), rot=QI, vel=(0.1, 0.0, -0.05),
        dim_x=2, dim_y=2, cell_x=0.3, cell_y=0.3, mass=0.2,
    )
    return _finalize(b)


def test_gradcheck_triangles():
    m = _cloth_model()
    # perturb off the rest pose so membrane forces are non-zero
    x0 = m.particle_q_init * jnp.asarray(
        np.random.RandomState(0).uniform(0.95, 1.05, m.particle_q_init.shape)
        .astype(np.float32)
    )
    v0 = m.particle_qd_init
    config.gradcheck(lambda x, v: _weighted(part.eval_triangles(m, x, v)) * 1e-2,
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=5e-2, argnums=0)
    config.gradcheck(lambda x, v: _weighted(part.eval_triangles(m, x, v)) * 1e-2,
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=5e-2, argnums=1)


def test_gradcheck_bending():
    # one explicit hinge (shared edge p2-p3, wings p0/p1), bent out of plane
    b = ModelBuilder()
    b.add_particle((0.8, 0.25, 0.5), (0.02, 0.0, 0.0), 0.1)   # wing 1
    b.add_particle((-0.8, 0.35, 0.5), (0.0, -0.03, 0.0), 0.1)  # wing 2
    b.add_particle((0.0, 0.0, 0.0), (0.0, 0.0, 0.01), 0.1)     # edge v0
    b.add_particle((0.0, 0.0, 1.0), (0.01, 0.0, 0.0), 0.1)     # edge v1
    b.add_edge(0, 1, 2, 3, rest=0.0)
    m = dataclasses.replace(_finalize(b), edge_ke=5.0, edge_kd=0.5)
    x0, v0 = m.particle_q_init, m.particle_qd_init
    config.gradcheck(lambda x, v: _weighted(part.eval_bending(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(lambda x, v: _weighted(part.eval_bending(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=1)


def test_gradcheck_tetrahedra():
    b = ModelBuilder()
    b.add_particle((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_particle((0.3, 0.0, 0.0), (0.05, 0.0, 0.0), 1.0)
    b.add_particle((0.0, 0.3, 0.0), (0.0, -0.05, 0.0), 1.0)
    b.add_particle((0.0, 0.0, 0.3), (0.0, 0.0, 0.05), 1.0)
    b.add_tetrahedron(0, 1, 2, 3, k_mu=100.0, k_lambda=100.0, k_damp=1.0)
    m = _finalize(b)
    rs = np.random.RandomState(2)
    x0 = m.particle_q_init + jnp.asarray(
        rs.uniform(-0.03, 0.03, (4, 3)).astype(np.float32)
    )
    v0 = m.particle_qd_init
    config.gradcheck(lambda x, v: _weighted(part.eval_tetrahedra(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(lambda x, v: _weighted(part.eval_tetrahedra(m, x, v)),
                     (x0, v0), eps=1e-3, rtol=5e-2, atol=1e-2, argnums=1)


def test_gradcheck_particle_ground_contacts():
    b = ModelBuilder()
    b.add_particle((0.0, -0.02, 0.0), (0.05, -0.1, 0.02), 1.0)  # penetrating
    b.add_particle((0.5, -0.01, 0.1), (-0.03, -0.2, 0.0), 1.0)
    m = _finalize(b, ground=True, contact_ke=100.0, contact_kd=10.0,
                  contact_kf=10.0, contact_mu=0.5)
    x0, v0 = m.particle_q_init, m.particle_qd_init
    config.gradcheck(lambda x, v: _weighted(part.eval_ground_contacts(m, x, v)),
                     (x0, v0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(lambda x, v: _weighted(part.eval_ground_contacts(m, x, v)),
                     (x0, v0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=1)


def test_gradcheck_soft_contacts():
    b = ModelBuilder()
    b.add_particle((0.0, 0.48, 0.02), (0.02, -0.1, 0.0), 1.0)  # inside margin
    b.add_shape_sphere(-1, pos=(0.0, 0.0, 0.0), radius=0.5, density=0.0)
    m = _finalize(b, ground=False, contact_ke=100.0, contact_kd=10.0,
                  contact_kf=10.0, contact_mu=0.5)
    x0, v0 = m.particle_q_init, m.particle_qd_init

    def loss(x, v):
        pf, _ = part.eval_soft_contacts(m, x, v, None, None)
        return _weighted(pf)

    config.gradcheck(loss, (x0, v0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(loss, (x0, v0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=1)


def _pendulum_model(limits=(-0.5, 0.5), stiffness=3.0, damping=0.5,
                    ground=False):
    b = ModelBuilder()
    b.add_articulation()
    l0 = b.add_link(-1, np.array([0.0, 0.4, 0.0, *QI]), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE, limit_lower=limits[0],
                    limit_upper=limits[1], limit_ke=20.0, limit_kd=2.0,
                    stiffness=stiffness, damping=damping)
    b.add_shape_capsule(l0, pos=(0.3, 0.0, 0.0), radius=0.08, half_width=0.3,
                        density=500.0, ke=100.0, kd=10.0, kf=10.0, mu=0.5)
    b.joint_q[0] = 0.65  # past the upper limit: limit penalty active
    return _finalize(b, ground=ground, contact_ke=100.0, contact_kd=10.0,
                     contact_kf=10.0, contact_mu=0.5)


def test_gradcheck_joint_limits_and_tau():
    m = _pendulum_model()
    q0 = jnp.asarray([0.65], dtype=jnp.float32)
    qd0 = jnp.asarray([0.3], dtype=jnp.float32)
    act = jnp.asarray([0.8], dtype=jnp.float32)

    def loss(q, qd, a):
        X_sc, X_sm = art.eval_fk(m, q)
        S_s, v_s, f_s = art.eval_id(m, q, qd, X_sc, X_sm)
        return _weighted(art.eval_tau(m, q, qd, a, S_s, f_s))

    for argnums in (0, 1, 2):
        config.gradcheck(loss, (q0, qd0, act), eps=1e-4, rtol=5e-2,
                         atol=1e-2, argnums=argnums)


def test_gradcheck_articulation_ground_contacts():
    # hang the capsule low enough that its contact points penetrate
    m = _pendulum_model(ground=True)
    q0 = jnp.asarray([-1.2], dtype=jnp.float32)
    qd0 = jnp.asarray([0.4], dtype=jnp.float32)

    def loss(q, qd):
        X_sc, X_sm = art.eval_fk(m, q)
        _, v_s, _ = art.eval_id(m, q, qd, X_sc, X_sm)
        return _weighted(art.eval_ground_contacts(m, X_sc, v_s))

    # confirm contact is actually active
    assert float(jnp.max(jnp.abs(jax.grad(loss)(q0, qd0)))) > 0.0
    config.gradcheck(loss, (q0, qd0), eps=1e-4, rtol=5e-2, atol=1e-2,
                     argnums=0)
    config.gradcheck(loss, (q0, qd0), eps=1e-4, rtol=5e-2, atol=1e-2,
                     argnums=1)


def test_gradcheck_muscles():
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
    b.joint_q[0] = 0.3
    b.joint_q[1] = -0.4
    m = _finalize(b)

    q0 = jnp.asarray([0.3, -0.4], dtype=jnp.float32)
    a0 = jnp.asarray([0.7], dtype=jnp.float32)

    def loss(q, a):
        X_sc, _ = art.eval_fk(m, q)
        return _weighted(art.eval_muscles(m, X_sc, a))

    config.gradcheck(loss, (q0, a0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=0)
    config.gradcheck(loss, (q0, a0), eps=1e-4, rtol=5e-2, atol=1e-2, argnums=1)


# ---------------------------------------------------------------------------
# manual (hand-written) simulate VJP == autodiff/remat VJP
# ---------------------------------------------------------------------------

def _grads_through_simulate(m, q0, qd0, ja, ma, backward, substeps=8, mm=4):
    from diffrl_tpu.sim import simulate
    from diffrl_tpu.sim.model import State

    def loss(q, qd, a, mu):
        s = simulate(m, State(joint_q=q, joint_qd=qd), joint_act=a,
                     muscle_act=mu, dt=1 / 60, substeps=substeps,
                     mass_matrix_freq=mm, backward=backward)
        w = jnp.cos(jnp.arange(s.joint_q.shape[-1], dtype=jnp.float32))
        return jnp.sum(s.joint_q * w) + 0.5 * jnp.sum(s.joint_qd ** 2)

    argnums = (0, 1, 2) if ma is None else (0, 1, 2, 3)
    args = (q0, qd0, ja) if ma is None else (q0, qd0, ja, ma)
    if ma is None:
        fn = lambda q, qd, a: loss(q, qd, a, None)
    else:
        fn = loss
    val = jax.jit(fn)(*args)
    grads = jax.jit(jax.grad(fn, argnums=argnums))(*args)
    return float(val), [np.asarray(g) for g in grads]


def test_manual_backward_matches_remat_ant(ant_settled):
    """The hand-written reverse pass (_simulate_manual) computes the SAME
    gradients as autodiff through the remat scan, through a contact-rich
    Ant state with mass-matrix caching active."""
    env, state, _ = ant_settled
    m = env.model
    q0, qd0 = state.joint_q[0], state.joint_qd[0]
    ja = jnp.asarray(
        np.random.RandomState(7).uniform(-30, 30, m.dof_count)
        .astype(np.float32))

    v_r, g_r = _grads_through_simulate(m, q0, qd0, ja, None, "remat")
    v_m, g_m = _grads_through_simulate(m, q0, qd0, ja, None, "manual")
    assert abs(v_r - v_m) <= 1e-4 * max(1.0, abs(v_r))
    for a, b in zip(g_r, g_m):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_manual_backward_matches_remat_muscles():
    """Same check through the muscle path (muscle_act cotangent) and the
    mass_matrix_freq=1 (refresh-every-substep) layout."""
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
    m = _finalize(b)

    q0 = jnp.asarray([0.3, -0.4], dtype=jnp.float32)
    qd0 = jnp.asarray([0.1, 0.2], dtype=jnp.float32)
    ja = jnp.asarray([0.5, -0.5], dtype=jnp.float32)
    ma = jnp.asarray([0.7], dtype=jnp.float32)

    for mm in (1, 4):
        v_r, g_r = _grads_through_simulate(m, q0, qd0, ja, ma, "remat", mm=mm)
        v_m, g_m = _grads_through_simulate(m, q0, qd0, ja, ma, "manual", mm=mm)
        assert abs(v_r - v_m) <= 1e-4 * max(1.0, abs(v_r))
        for a, b_ in zip(g_r, g_m):
            np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)
