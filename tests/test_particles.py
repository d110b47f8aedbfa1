"""Particle/deformable physics tests.

JAX-native equivalents of the reference's scenario tests
(/root/reference/dflex/tests/test_ballistic.py, test_chain.py, test_cloth.py,
test_bending.py, test_beam.py, test_rigid_bounce.py semantics): build a tiny
scene, simulate, check physical invariants, and verify analytic gradients
against central finite differences (test_ant.py:390-424 pattern).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.sim import (
    Model,
    ModelBuilder,
    SemiImplicitIntegrator,
    State,
    XPBDIntegrator,
    simulate,
    simulate_xpbd,
)


def run_steps(model, state, n, dt=1.0 / 60.0, substeps=4, xpbd=False):
    """n env-steps under ONE jitted scan (fast on the CPU test backend)."""
    if xpbd:
        def body(s, _):
            return simulate_xpbd(model, s, dt=dt, substeps=substeps), None
    else:
        def body(s, _):
            return simulate(model, s, dt=dt, substeps=substeps), None
    return jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n)[0]
    )(state)


def fd_grad(f, x, eps=1e-3):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    for i in range(flat.size):
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        g.reshape(-1)[i] = (
            float(f(jnp.asarray(xp.reshape(x.shape), dtype=jnp.float32)))
            - float(f(jnp.asarray(xm.reshape(x.shape), dtype=jnp.float32)))
        ) / (2 * eps)
    return g


def test_ballistic_particle():
    """Free-falling particle follows closed-form kinematics (no ground)."""
    b = ModelBuilder()
    b.add_particle((0.0, 5.0, 0.0), (1.0, 2.0, 0.0), 1.0)
    model = dataclasses.replace(b.finalize(), ground=False)

    dt, substeps = 1.0 / 60.0, 4
    state = run_steps(model, model.state(), 30, dt=dt, substeps=substeps)

    t = 30 * dt
    h = dt / substeps
    # semi-implicit Euler has a first-order bias of g*t*h/2 in position
    x_expect = np.array([1.0 * t, 5.0 + 2.0 * t - 4.9 * t * t - 9.8 * t * h / 2, 0.0])
    np.testing.assert_allclose(np.asarray(state.particle_q[0]), x_expect, atol=2e-3)


def test_ballistic_gradient_fd():
    """d(final height)/d(initial velocity) matches finite differences."""
    b = ModelBuilder()
    b.add_particle((0.0, 5.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    model = dataclasses.replace(b.finalize(), ground=False)

    @jax.jit
    def loss(v0):
        state = State(
            joint_q=model.joint_q_init, joint_qd=model.joint_qd_init,
            particle_q=model.particle_q_init, particle_qd=v0[None, :],
        )
        def body(s, _):
            return simulate(model, s, dt=1.0 / 60.0, substeps=2), None
        state = jax.lax.scan(body, state, None, length=10)[0]
        return state.particle_q[0, 1]

    v0 = jnp.array([0.0, 1.0, 0.0])
    g = jax.grad(loss)(v0)
    g_fd = fd_grad(loss, v0)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-2, atol=1e-4)


def test_spring_forces_and_gradient():
    """Damped spring pulls particles together; gradient matches FD."""
    b = ModelBuilder()
    b.add_particle((0.0, 2.0, 0.0), (0.0, 0.0, 0.0), 0.0)  # pinned
    b.add_particle((1.5, 2.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_spring(0, 1, ke=100.0, kd=1.0, control=0.0)
    # rest length is the initial 1.5; stretch it by moving particle 1
    model = dataclasses.replace(b.finalize(), ground=False)

    @jax.jit
    def loss(x1):
        state = State(
            joint_q=model.joint_q_init, joint_qd=model.joint_qd_init,
            particle_q=jnp.stack([model.particle_q_init[0], x1]),
            particle_qd=jnp.zeros((2, 3)),
        )
        def body(s, _):
            return simulate(model, s, dt=1.0 / 60.0, substeps=4), None
        state = jax.lax.scan(body, state, None, length=8)[0]
        return jnp.sum((state.particle_q[1] - state.particle_q[0]) ** 2)

    x1 = jnp.array([2.5, 2.0, 0.0])  # stretched
    l0 = loss(jnp.array([1.5, 2.0, 0.0]))
    l1 = loss(x1)
    assert float(l1) > float(l0)  # stretched spring stores displacement

    g = jax.grad(loss)(x1)
    g_fd = fd_grad(loss, x1, eps=1e-3)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-2, atol=1e-3)


def _cloth_model(dim=3):
    b = ModelBuilder()
    b.add_cloth_grid(
        pos=(0.0, 2.0, 0.0),
        rot=np.array([0.0, 0.0, 0.0, 1.0]),
        vel=(0.0, 0.0, 0.0),
        dim_x=dim, dim_y=dim, cell_x=0.1, cell_y=0.1, mass=0.1,
        fix_top=True,
    )
    m = b.finalize()
    return dataclasses.replace(
        m, ground=False, tri_ke=100.0, tri_ka=100.0, tri_kd=5.0,
        edge_ke=1.0, edge_kd=0.1,
    )


def test_cloth_hangs_and_stays_finite():
    model = _cloth_model()
    state = model.state()
    y0 = float(jnp.mean(state.particle_q[:, 1]))
    state = run_steps(model, state, 30, substeps=8)
    q = np.asarray(state.particle_q)
    assert np.all(np.isfinite(q))
    assert float(np.mean(q[:, 1])) < y0  # free rows sag under gravity
    # pinned top row does not move
    top = np.asarray(model.particle_inv_mass) == 0.0
    np.testing.assert_allclose(
        q[top], np.asarray(model.particle_q_init)[top], atol=1e-6
    )


def test_cloth_gradient_finite():
    model = _cloth_model(dim=2)

    def loss(q0):
        state = State(
            joint_q=model.joint_q_init, joint_qd=model.joint_qd_init,
            particle_q=q0, particle_qd=jnp.zeros_like(q0),
        )
        def body(s, _):
            return simulate(model, s, dt=1.0 / 60.0, substeps=4), None
        state = jax.lax.scan(body, state, None, length=5)[0]
        return jnp.sum(state.particle_q[:, 1])

    g = jax.jit(jax.grad(loss))(model.particle_q_init)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_bending_restores_rest_angle():
    """A hinge bent away from rest angle experiences a restoring force."""
    b = ModelBuilder()
    # two triangles sharing edge (2,3): bent 90 degrees at build time = rest
    b.add_particle((0.0, 1.0, -1.0), (0.0, 0.0, 0.0), 1.0)   # x1
    b.add_particle((0.0, 2.0, 1.0), (0.0, 0.0, 0.0), 1.0)    # x2 (lifted)
    b.add_particle((1.0, 1.0, 0.0), (0.0, 0.0, 0.0), 0.0)    # x3 edge (pinned)
    b.add_particle((-1.0, 1.0, 0.0), (0.0, 0.0, 0.0), 0.0)   # x4 edge (pinned)
    b.add_triangle(0, 2, 3)
    b.add_triangle(1, 3, 2)
    b.add_edge(0, 1, 2, 3, rest=0.0)  # flat rest angle
    model = dataclasses.replace(
        b.finalize(), ground=False, tri_ke=0.0, tri_ka=1e-9, tri_kd=0.0,
        edge_ke=50.0, edge_kd=1.0,
        gravity=jnp.zeros(3),
    )
    from diffrl_tpu.sim.particles import eval_bending
    f = eval_bending(model, model.particle_q_init, model.particle_qd_init)
    assert bool(jnp.all(jnp.isfinite(f)))
    # the hinge is bent: free particles must feel a restoring force
    assert float(jnp.linalg.norm(f[0])) + float(jnp.linalg.norm(f[1])) > 1e-3


def _beam_model():
    b = ModelBuilder()
    b.add_soft_grid(
        pos=(0.0, 1.0, 0.0), rot=np.array([0.0, 0.0, 0.0, 1.0]),
        vel=(0.0, 0.0, 0.0), dim_x=3, dim_y=1, dim_z=1,
        cell_x=0.1, cell_y=0.1, cell_z=0.1, density=100.0,
        k_mu=2000.0, k_lambda=2000.0, k_damp=10.0, fix_left=True,
    )
    return dataclasses.replace(b.finalize(), ground=False)


def test_fem_beam_sags():
    model = _beam_model()
    state = run_steps(model, model.state(), 40, substeps=8)
    q = np.asarray(state.particle_q)
    assert np.all(np.isfinite(q))
    # free end droops below its start height but the beam holds together
    free_end = q[np.asarray(model.particle_q_init)[:, 0] > 0.25]
    assert np.mean(free_end[:, 1]) < 1.0
    assert np.mean(free_end[:, 1]) > 0.0


def test_fem_gradient_finite():
    model = _beam_model()

    def loss(q0):
        state = State(
            joint_q=model.joint_q_init, joint_qd=model.joint_qd_init,
            particle_q=q0, particle_qd=jnp.zeros_like(q0),
        )
        def body(s, _):
            return simulate(model, s, dt=1.0 / 60.0, substeps=4), None
        state = jax.lax.scan(body, state, None, length=3)[0]
        return jnp.mean(state.particle_q[:, 1])

    g = jax.jit(jax.grad(loss))(model.particle_q_init)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_particle_ground_contact():
    """Dropped particle settles near the ground plane, not through it."""
    b = ModelBuilder()
    b.add_particle((0.0, 0.5, 0.0), (0.0, 0.0, 0.0), 1.0)
    model = dataclasses.replace(
        b.finalize(), ground=True,
        contact_ke=1.0e4, contact_kd=100.0, contact_kf=100.0, contact_mu=0.5,
    )
    state = run_steps(model, model.state(), 120, substeps=8)
    y = float(state.particle_q[0, 1])
    assert -0.05 < y < 0.05


def test_soft_contact_static_sphere():
    """Particle resting on a static (body=-1) sphere shape is supported."""
    b = ModelBuilder()
    b.add_particle((0.0, 0.62, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_shape_sphere(-1, pos=(0.0, 0.0, 0.0), radius=0.5, density=0.0)
    model = dataclasses.replace(
        b.finalize(), ground=False,
        contact_ke=1.0e4, contact_kd=100.0, contact_kf=100.0, contact_mu=0.5,
    )
    state = run_steps(model, model.state(), 60, substeps=8)
    y = float(state.particle_q[0, 1])
    assert np.isfinite(y)
    assert y > 0.4  # supported near the sphere surface, did not fall through


def test_xpbd_particle_drop():
    b = ModelBuilder()
    b.add_particle((0.0, 0.3, 0.0), (0.0, 0.0, 0.0), 1.0)
    model = dataclasses.replace(b.finalize(), ground=True)
    state = run_steps(model, model.state(), 60, substeps=4, xpbd=True)
    y = float(state.particle_q[0, 1])
    assert np.isfinite(y)
    assert -0.02 < y < 0.05


def test_xpbd_spring_pair():
    """Single XPBD distance constraint: pendulum bob stays at rest length.

    (A multi-spring Jacobi chain is only marginally stable in this scheme —
    the reference's solve_springs has the XPBD compliance term commented out
    — so the deterministic test uses the stable single-constraint case.)"""
    b = ModelBuilder()
    b.add_particle((0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 0.0)   # pinned
    b.add_particle((0.1, 1.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_spring(0, 1, ke=1e3, kd=1.0, control=0.0)
    model = dataclasses.replace(b.finalize(), ground=False)
    state = run_steps(model, model.state(), 120, substeps=8, xpbd=True)
    q = np.asarray(state.particle_q)
    assert np.all(np.isfinite(q))
    d = np.linalg.norm(q[1] - q[0])
    assert 0.08 < d < 0.12  # constraint holds the 0.1 rest length


def test_xpbd_compliance_softens_spring():
    """With the XPBD compliance term alpha = 1/(ke dt^2) enabled (the
    reference ships it commented out, sim.py:2661-2663), a SOFT spring
    under gravity sags more than the rigid-constraint default, and a very
    stiff spring converges to the same answer."""
    def run(ke, compliance):
        b = ModelBuilder()
        b.add_particle((0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 0.0)   # pinned
        b.add_particle((0.0, 0.9, 0.0), (0.0, 0.0, 0.0), 1.0)   # hanging
        b.add_spring(0, 1, ke=ke, kd=1.0, control=0.0)
        model = dataclasses.replace(
            b.finalize(), ground=False, xpbd_compliance=compliance
        )
        state = run_steps(model, model.state(), 120, substeps=8, xpbd=True)
        q = np.asarray(state.particle_q)
        assert np.all(np.isfinite(q))
        return np.linalg.norm(q[1] - q[0])

    # soft spring: compliance lets it stretch under gravity
    stretch_soft = run(2.0e2, True)
    stretch_rigid = run(2.0e2, False)
    assert stretch_soft > stretch_rigid + 0.005, (stretch_soft, stretch_rigid)
    # stiff spring: compliance is negligible
    np.testing.assert_allclose(run(1.0e6, True), run(1.0e6, False), atol=1e-3)


def test_semi_implicit_integrator_class_api():
    b = ModelBuilder()
    b.add_particle((0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    model = dataclasses.replace(b.finalize(), ground=False)
    integ = SemiImplicitIntegrator()
    state = integ.forward(model, model.state(), 1.0 / 60.0, substeps=4)
    assert state.particle_q.shape == (1, 3)


def test_lift_drag_aerodynamics():
    """Cloth aero forces (test_lift_drag.py analog): a moving triangle in
    'air' feels drag opposing velocity; forces are finite and differentiable."""
    b = ModelBuilder()
    b.add_particle((0.0, 2.0, 0.0), (0.0, 0.0, 2.0), 1.0)
    b.add_particle((0.5, 2.0, 0.0), (0.0, 0.0, 2.0), 1.0)
    b.add_particle((0.0, 2.5, 0.0), (0.0, 0.0, 2.0), 1.0)
    b.add_triangle(0, 1, 2)
    model = dataclasses.replace(
        b.finalize(), ground=False,
        tri_ke=100.0, tri_ka=100.0, tri_kd=1.0, tri_drag=5.0, tri_lift=5.0,
    )
    from diffrl_tpu.sim.particles import eval_triangles

    f = eval_triangles(model, model.particle_q_init, model.particle_qd_init)
    assert bool(jnp.all(jnp.isfinite(f)))
    # drag acts against the +z motion on the free vertices
    assert float(jnp.sum(f[:, 2])) < 0.0

    def loss(v0):
        f = eval_triangles(model, model.particle_q_init, v0)
        return jnp.sum(f ** 2)

    g = jax.grad(loss)(model.particle_qd_init)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_cloth_rigid_contact():
    """Cloth-vs-rigid contact (test_cloth_collisions.py analog): a rigid
    contact point pressing into a triangle pushes the vertices away."""
    from diffrl_tpu.sim.particles import eval_triangles_rigid_contacts

    b = ModelBuilder()
    b.add_particle((-1.0, 0.0, -1.0), (0.0, 0.0, 0.0), 1.0)
    b.add_particle((1.0, 0.0, -1.0), (0.0, 0.0, 0.0), 1.0)
    b.add_particle((0.0, 0.0, 1.0), (0.0, 0.0, 0.0), 1.0)
    b.add_triangle(0, 1, 2)
    model = dataclasses.replace(b.finalize(), ground=False)

    # one rigid body just above the triangle centroid, moving down
    rigid_x = jnp.array([[0.0, 0.1, 0.0]])
    rigid_r = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    rigid_v = jnp.array([[0.0, -1.0, 0.0]])
    rigid_w = jnp.zeros((1, 3))
    cb = jnp.zeros(1, dtype=jnp.int32)
    cp = jnp.zeros((1, 3))
    cd = jnp.array([0.0])
    cm = jnp.array([[1.0e4, 100.0, 100.0, 0.5]])

    f = eval_triangles_rigid_contacts(
        model, model.particle_q_init, model.particle_qd_init,
        rigid_x, rigid_r, rigid_v, rigid_w, cb, cp, cd, cm,
    )
    assert bool(jnp.all(jnp.isfinite(f)))
    # the sphere point is within the 0.05 margin: vertices get pushed down
    # (normal points from triangle into the body, force applied along it)
    assert float(jnp.abs(f).sum()) > 0.0

    def loss(q0):
        f = eval_triangles_rigid_contacts(
            model, q0, model.particle_qd_init,
            rigid_x, rigid_r, rigid_v, rigid_w, cb, cp, cd, cm,
        )
        return jnp.sum(f ** 2)

    g = jax.grad(loss)(model.particle_q_init)
    assert bool(jnp.all(jnp.isfinite(g)))


def _crumpled_cloth(dim=4, seed=0):
    """Cloth topology with positions crumpled into a small box so many
    particle-triangle pairs are inside the 0.1 contact radius."""
    model = _cloth_model(dim=dim)
    rng = np.random.default_rng(seed)
    P = model.particle_q_init.shape[0]
    x = jnp.asarray(rng.uniform(0.0, 0.3, size=(P, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(0.0, 0.1, size=(P, 3)).astype(np.float32))
    return model, x, v


def test_hashed_tri_collision_matches_allpairs():
    """Spatial-hash self-collision (beyond the reference's O(T*P) all-pairs
    kernel, sim.py:376-433) reproduces the all-pairs forces exactly when the
    cell covers the contact radius and no bucket overflows."""
    from diffrl_tpu.sim.particles import (
        eval_triangles_contact,
        eval_triangles_contact_hashed,
    )

    model, x, v = _crumpled_cloth(dim=4)
    P = x.shape[0]
    model = dataclasses.replace(
        model, tri_collision_cell_size=1.0,
        tri_collision_buckets=64, tri_collision_capacity=P,
    )
    f_all = eval_triangles_contact(model, x, v)
    f_hash = jax.jit(eval_triangles_contact_hashed)(model, x, v)
    assert float(jnp.abs(f_all).max()) > 0.0  # contacts are actually active
    # same pair set, same math; tolerance covers f32 reassociation under jit
    # (1e5-stiff penalty forces, ~675-way candidate sums)
    np.testing.assert_allclose(
        np.asarray(f_hash), np.asarray(f_all), rtol=1e-3, atol=1e-2
    )


def test_hashed_tri_collision_overflow_and_dispatch():
    """Bucket overflow drops candidates but stays finite; the "hashed" value
    of enable_tri_collisions routes particle_forces through the broad-phase."""
    from diffrl_tpu.sim.particles import particle_forces

    model, x, v = _crumpled_cloth(dim=3)
    model = dataclasses.replace(
        model, enable_tri_collisions="hashed",
        tri_collision_cell_size=0.5, tri_collision_buckets=32,
        tri_collision_capacity=2,
    )
    f = jax.jit(particle_forces)(model, x, v)
    assert bool(jnp.all(jnp.isfinite(f)))

    # gradients flow through the table build (sort + gather + scatter)
    def loss(x0):
        from diffrl_tpu.sim.particles import eval_triangles_contact_hashed
        return jnp.sum(eval_triangles_contact_hashed(model, x0, v) ** 2)

    g = jax.jit(jax.grad(loss))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
