"""Physics scenario tests for the articulated dynamics core.

Mirrors the reference's script-style scenario tests (dflex/tests/) with
analytic oracles and central-finite-difference gradient checks
(test_ant.py:390-424 pattern).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu import sim
from diffrl_tpu.sim import ModelBuilder, State


def build_free_sphere(ground=True, density=1000.0, kd=1000.0):
    b = ModelBuilder()
    b.add_articulation()
    link = b.add_link(
        -1, sim.model.np_transform_identity(), (0.0, 0.0, 0.0), sim.JOINT_FREE
    )
    b.add_shape_sphere(link, radius=0.5, density=density, ke=1.0e4, kd=kd, kf=1000.0, mu=0.5)
    m = b.finalize()
    return dataclasses.replace(m, ground=ground, gravity=jnp.array([0.0, -9.81, 0.0]))


def build_pendulum(stiffness=0.0, damping=0.0):
    b = ModelBuilder()
    b.add_articulation()
    link = b.add_link(
        -1,
        sim.model.np_transform_identity(),
        (0.0, 0.0, 1.0),
        sim.JOINT_REVOLUTE,
        armature=0.0,
        stiffness=stiffness,
        damping=damping,
        limit_lower=-1.0e3,
        limit_upper=1.0e3,
        limit_ke=0.0,
        limit_kd=0.0,
    )
    b.add_shape_capsule(link, pos=(0.5, 0.0, 0.0), radius=0.05, half_width=0.5, density=1000.0)
    m = b.finalize()
    return dataclasses.replace(m, ground=False, gravity=jnp.array([0.0, -9.81, 0.0]))


class TestBallistic:
    def test_free_fall_matches_symplectic_euler(self):
        model = build_free_sphere(ground=False)
        state = model.state()
        # start above the ground
        q0 = state.joint_q.at[1].set(2.0)
        state = State(joint_q=q0, joint_qd=state.joint_qd)

        dt, substeps = 1.0 / 60.0, 4
        h = dt / substeps
        steps = 30

        step = jax.jit(
            lambda s: sim.simulate(model, s, dt=dt, substeps=substeps, mass_matrix_freq=1)
        )
        for _ in range(steps):
            state = step(state)

        # symplectic Euler oracle on (v, y)
        y, v = 2.0, 0.0
        for _ in range(steps * substeps):
            v -= 9.81 * h
            y += v * h
        np.testing.assert_allclose(float(state.joint_q[1]), y, rtol=1e-4)
        np.testing.assert_allclose(float(state.joint_qd[4]), v, rtol=1e-4)
        # x/z and rotation unchanged
        np.testing.assert_allclose(state.joint_q[0], 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.joint_q[3:7]), [0, 0, 0, 1], atol=1e-5)


class TestPendulum:
    def test_initial_acceleration(self):
        """qdd at rest = -m g d / (I_z + m d^2) for a horizontal pendulum."""
        model = build_pendulum()
        q = jnp.zeros(1)
        qd = jnp.zeros(1)
        _, qd1, _ = sim.articulation_substep(
            model, q, qd, jnp.zeros(1), None, dt=1e-3
        )
        qdd = float(qd1[0]) / 1e-3

        mb = ModelBuilder()
        m_mass, I = mb.compute_capsule_inertia(1000.0, 0.05, 1.0)
        d = 0.5  # COM distance from the joint
        I_joint = I[2, 2] + m_mass * d * d
        qdd_expect = -m_mass * 9.81 * d / I_joint
        np.testing.assert_allclose(qdd, qdd_expect, rtol=1e-3)

    def test_energy_approximately_conserved(self):
        model = build_pendulum()
        state = State(joint_q=jnp.array([1.0]), joint_qd=jnp.zeros(1))

        mb = ModelBuilder()
        m_mass, I = mb.compute_capsule_inertia(1000.0, 0.05, 1.0)
        d = 0.5
        I_joint = I[2, 2] + m_mass * d * d

        def energy(s):
            theta = float(s.joint_q[0])
            w = float(s.joint_qd[0])
            # COM height for axis-z rotation from the +x rest direction
            y = d * math.sin(theta)
            return 0.5 * I_joint * w * w + m_mass * 9.81 * y

        e0 = energy(state)
        step = jax.jit(lambda s: sim.simulate(model, s, dt=1.0 / 60.0, substeps=16))
        for _ in range(60):
            state = step(state)
        e1 = energy(state)
        assert abs(e1 - e0) / abs(e0) < 0.05, (e0, e1)

    def test_grad_matches_finite_difference(self):
        model = build_pendulum()

        def loss(qd0):
            s = State(joint_q=jnp.array([0.3]), joint_qd=qd0)
            for _ in range(5):
                s = sim.simulate(model, s, dt=1.0 / 60.0, substeps=4)
            return s.joint_q[0]

        qd0 = jnp.array([0.7])
        g = jax.grad(loss)(qd0)
        eps = 1e-3
        fd = (loss(qd0 + eps) - loss(qd0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2)

    def test_pd_target_holds_joint(self):
        model = build_pendulum(stiffness=5000.0, damping=100.0)
        model = dataclasses.replace(model, joint_target=jnp.array([0.5]))
        state = State(joint_q=jnp.array([0.5]), joint_qd=jnp.zeros(1))
        step = jax.jit(lambda s: sim.simulate(model, s, dt=1.0 / 60.0, substeps=16))
        for _ in range(120):
            state = step(state)
        # strong PD should hold near the target against gravity
        assert abs(float(state.joint_q[0]) - 0.5) < 0.05


class TestContacts:
    def test_sphere_settles_on_ground(self):
        # light sphere + strong approach damping so the penalty contact
        # settles within a few seconds (damping is one-sided, sim.py:1188)
        model = build_free_sphere(ground=True, density=100.0, kd=1.0e4)
        state = model.state()
        state = State(joint_q=state.joint_q.at[1].set(0.6), joint_qd=state.joint_qd)

        step = jax.jit(lambda s: sim.simulate(model, s, dt=1.0 / 60.0, substeps=16))
        ys = []
        for i in range(360):
            state = step(state)
            if i >= 300:
                ys.append(float(state.joint_q[1]))

        # rests slightly below radius: ke * c = m g  =>  c = m g / ke
        m_mass, _ = ModelBuilder.compute_sphere_inertia(100.0, 0.5)
        c = m_mass * 9.81 / 1.0e4
        y_mean = float(np.mean(ys))
        assert abs(y_mean - (0.5 - c)) < 0.02, (y_mean, 0.5 - c)
        # residual bounce amplitude is small
        assert float(np.std(ys)) < 0.01

    def test_contact_grad_finite(self):
        model = build_free_sphere(ground=True)

        def loss(y0):
            q = model.joint_q_init.at[1].set(y0[0])
            s = State(joint_q=q, joint_qd=model.joint_qd_init)
            for _ in range(10):
                s = sim.simulate(model, s, dt=1.0 / 60.0, substeps=4)
            return s.joint_q[1]

        g = jax.grad(lambda y: loss(y))(jnp.array([0.55]))
        assert np.all(np.isfinite(np.asarray(g)))
        eps = 1e-3
        fd = (loss(jnp.array([0.55 + eps])) - loss(jnp.array([0.55 - eps]))) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=5e-2, atol=5e-3)


class TestBatching:
    def test_vmap_matches_individual(self):
        model = build_pendulum()

        def rollout(q0):
            s = State(joint_q=q0[None], joint_qd=jnp.zeros(1))
            s = sim.simulate(model, s, dt=1.0 / 60.0, substeps=8)
            return s.joint_q[0]

        q0s = jnp.array([0.1, 0.5, -0.4, 1.2])
        batched = jax.vmap(rollout)(q0s)
        for i in range(4):
            np.testing.assert_allclose(
                float(batched[i]), float(rollout(q0s[i])), rtol=1e-6
            )

    def test_build_tree_chain_fk(self):
        # procedural chain builder (reference load_utils.py:232-285):
        # at q=0, angle=0, each link frame sits 2*length along +x
        from diffrl_tpu.sim.articulation import eval_fk
        from diffrl_tpu.sim.importers.procedural import build_tree

        b = ModelBuilder()
        b.add_articulation()
        build_tree(b, angle=0.0, max_depth=4, length=0.25)
        model = b.finalize()
        assert model.link_count == 4 and model.dof_count == 4

        X_sc, _ = eval_fk(model, jnp.zeros(model.coord_count))
        np.testing.assert_allclose(
            np.asarray(X_sc[:, 0]), [0.5, 1.0, 1.5, 2.0], atol=1e-6
        )

        # and it simulates: the 4-link chain stays finite; a single-link
        # tree (a pendulum) must fall (multi-link roots can transiently
        # swing positive as the chain folds)
        m = dataclasses.replace(
            model, ground=False, gravity=jnp.array([0.0, -9.81, 0.0])
        )
        s = State(joint_q=jnp.zeros(4), joint_qd=jnp.zeros(4))
        for _ in range(10):
            s = sim.simulate(m, s, dt=1.0 / 60.0, substeps=4)
        assert np.all(np.isfinite(np.asarray(s.joint_q)))

        b1 = ModelBuilder()
        b1.add_articulation()
        build_tree(b1, angle=0.0, max_depth=1, length=0.25)
        m1 = dataclasses.replace(
            b1.finalize(), ground=False, gravity=jnp.array([0.0, -9.81, 0.0])
        )
        s1 = State(joint_q=jnp.zeros(1), joint_qd=jnp.zeros(1))
        for _ in range(10):
            s1 = sim.simulate(m1, s1, dt=1.0 / 60.0, substeps=4)
        assert float(s1.joint_q[0]) < -0.01

    def test_mass_matrix_factored_matches_materialized(self):
        # factored H (no I_s/J materialization) must equal the dense path
        from diffrl_tpu.sim.articulation import (
            eval_fk,
            eval_id,
            eval_mass_matrix,
            eval_mass_matrix_factored,
            eval_spatial_inertias,
        )

        b = ModelBuilder()
        b.add_articulation()
        base = b.add_link(
            -1, sim.model.np_transform_identity(), (0.0, 0.0, 0.0), sim.JOINT_FREE
        )
        b.add_shape_sphere(base, radius=0.3, density=1000.0)
        l1 = b.add_link(
            base, sim.model.np_transform((0.4, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0)), (0.0, 0.0, 1.0),
            sim.JOINT_REVOLUTE,
        )
        b.add_shape_capsule(l1, pos=(0.3, 0.0, 0.0), radius=0.05, half_width=0.3,
                            density=1000.0)
        l2 = b.add_link(
            l1, sim.model.np_transform((0.6, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0)), (0.0, 1.0, 0.0),
            sim.JOINT_REVOLUTE,
        )
        b.add_shape_capsule(l2, pos=(0.3, 0.0, 0.0), radius=0.05, half_width=0.3,
                            density=1000.0)
        model = b.finalize()

        key = jax.random.PRNGKey(3)
        q = model.joint_q_init + 0.3 * jax.random.normal(key, (model.coord_count,))
        q = q.at[3:7].set(q[3:7] / jnp.linalg.norm(q[3:7]))
        qd = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (model.dof_count,))

        X_sc, X_sm = eval_fk(model, q)
        S_s, _, _ = eval_id(model, q, qd, X_sc, X_sm)
        dense = eval_mass_matrix(model, S_s, eval_spatial_inertias(model, X_sm))
        factored = eval_mass_matrix_factored(model, S_s, X_sm)
        np.testing.assert_allclose(
            np.asarray(factored), np.asarray(dense), rtol=1e-5, atol=1e-5
        )
        from diffrl_tpu.sim.articulation import eval_mass_matrix_crba

        crba = eval_mass_matrix_crba(model, S_s, X_sm)
        np.testing.assert_allclose(
            np.asarray(crba), np.asarray(dense), rtol=1e-4, atol=3e-5
        )

    def test_mass_matrix_crba_branched_tree(self):
        # branching (two children of the same link) exercises the subtree
        # composite-inertia accumulation
        from diffrl_tpu.sim.articulation import (
            eval_fk,
            eval_id,
            eval_mass_matrix,
            eval_mass_matrix_crba,
            eval_spatial_inertias,
        )

        b = ModelBuilder()
        b.add_articulation()
        base = b.add_link(
            -1, sim.model.np_transform_identity(), (0.0, 0.0, 0.0), sim.JOINT_FREE
        )
        b.add_shape_box(base, hx=0.2, hy=0.1, hz=0.15, density=800.0)
        for side in (-0.2, 0.2):
            l1 = b.add_link(
                base,
                sim.model.np_transform((side, -0.1, 0.0), (0.0, 0.0, 0.0, 1.0)),
                (0.0, 0.0, 1.0),
                sim.JOINT_REVOLUTE,
            )
            b.add_shape_capsule(l1, pos=(0.0, -0.2, 0.0), radius=0.04,
                                half_width=0.2, density=1000.0)
            l2 = b.add_link(
                l1,
                sim.model.np_transform((0.0, -0.4, 0.0), (0.0, 0.0, 0.0, 1.0)),
                (1.0, 0.0, 0.0),
                sim.JOINT_REVOLUTE,
            )
            b.add_shape_capsule(l2, pos=(0.0, -0.2, 0.0), radius=0.04,
                                half_width=0.2, density=1000.0)
        model = b.finalize()
        assert model.link_count == 5 and model.dof_count == 10

        key = jax.random.PRNGKey(7)
        q = model.joint_q_init + 0.2 * jax.random.normal(key, (model.coord_count,))
        q = q.at[3:7].set(q[3:7] / jnp.linalg.norm(q[3:7]))
        qd = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (model.dof_count,))

        X_sc, X_sm = eval_fk(model, q)
        S_s, _, _ = eval_id(model, q, qd, X_sc, X_sm)
        dense = eval_mass_matrix(model, S_s, eval_spatial_inertias(model, X_sm))
        crba = eval_mass_matrix_crba(model, S_s, X_sm)
        np.testing.assert_allclose(
            np.asarray(crba), np.asarray(dense), rtol=1e-4, atol=1e-5
        )

    def test_remat_granularity_invariant(self):
        # grouping substeps into larger checkpointed regions must not
        # change values or gradients (it only restructures the remat)
        model = build_pendulum()
        s0 = State(joint_q=jnp.array([0.8]), joint_qd=jnp.array([0.2]))

        def run(gran):
            return sim.simulate(
                model, s0, dt=1.0 / 60.0, substeps=16,
                mass_matrix_freq=16, remat_granularity=gran,
            ).joint_q

        np.testing.assert_array_equal(np.asarray(run(1)), np.asarray(run(3)))

        def g(gran):
            def loss(q):
                return sim.simulate(
                    model, State(joint_q=q, joint_qd=jnp.array([0.2])),
                    dt=1.0 / 60.0, substeps=16, mass_matrix_freq=16,
                    remat_granularity=gran,
                ).joint_q[0]
            return jax.grad(loss)(jnp.array([0.8]))

        np.testing.assert_allclose(
            np.asarray(g(1)), np.asarray(g(5)), rtol=1e-6
        )

    def test_mass_matrix_caching_close_to_exact(self):
        model = build_pendulum()
        s0 = State(joint_q=jnp.array([0.8]), joint_qd=jnp.array([0.2]))
        exact = sim.simulate(model, s0, dt=1.0 / 60.0, substeps=16, mass_matrix_freq=1)
        cached = sim.simulate(model, s0, dt=1.0 / 60.0, substeps=16, mass_matrix_freq=16)
        np.testing.assert_allclose(
            np.asarray(exact.joint_q), np.asarray(cached.joint_q), rtol=1e-3, atol=1e-4
        )


class TestMaximalCoordsRigid:
    """Maximal-coordinate rigid body family (test_rigid_bounce.py analog)."""

    def test_rigid_bounce(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from diffrl_tpu.sim.rigid import eval_rigid_contacts, integrate_rigids

        B = 1
        x = jnp.array([[0.0, 0.5, 0.0]])
        r = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1))
        v = jnp.zeros((B, 3))
        w = jnp.zeros((B, 3))
        inv_m = jnp.ones(B)
        inv_I = jnp.tile(jnp.eye(3) * 10.0, (B, 1, 1))
        gravity = jnp.array([0.0, -9.8, 0.0])

        cb = jnp.zeros(1, dtype=jnp.int32)
        cp = jnp.array([[0.0, 0.0, 0.0]])
        cd = jnp.array([0.1])  # sphere radius
        cm = jnp.array([[1.0e4, 100.0, 100.0, 0.5]])

        @jax.jit
        def step(state):
            x, r, v, w = state
            f, t = eval_rigid_contacts(x, r, v, w, cb, cp, cd, cm)
            return integrate_rigids(x, r, v, w, f, t, inv_m, inv_I, gravity,
                                    1.0 / 480.0)

        state = (x, r, v, w)
        ys = []
        for _ in range(960):
            state = step(state)
            ys.append(float(state[0][0, 1]))
        ys = np.array(ys)
        assert np.all(np.isfinite(ys))
        # settles near the contact thickness, never tunnels through
        assert ys.min() > 0.0
        assert abs(ys[-1] - 0.1) < 0.05

    def test_spin_conserves_momentum(self):
        import jax.numpy as jnp
        import numpy as np

        from diffrl_tpu.sim.rigid import integrate_rigids

        x = jnp.zeros((1, 3))
        r = jnp.array([[0.0, 0.0, 0.0, 1.0]])
        v = jnp.zeros((1, 3))
        w = jnp.array([[0.0, 0.0, 2.0]])
        inv_m = jnp.ones(1)
        inv_I = jnp.tile(jnp.eye(3), (1, 1, 1))
        g = jnp.zeros(3)
        f = jnp.zeros((1, 3))
        t = jnp.zeros((1, 3))
        state = (x, r, v, w)
        for _ in range(100):
            state = integrate_rigids(*state, f, t, inv_m, inv_I, g, 0.01)
        x1, r1, v1, w1 = state
        np.testing.assert_allclose(np.asarray(w1), [[0.0, 0.0, 2.0]], atol=1e-4)
        # unit quaternion maintained
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r1)), 1.0, atol=1e-5)
