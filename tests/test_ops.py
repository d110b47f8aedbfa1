"""Unit tests for the math core (quat / transform / spatial / linalg).

Oracles are independent numpy implementations (scipy-free), checked against
known identities rather than the reference source.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu import ops

rng = np.random.RandomState(0)


def rand_quat():
    q = rng.randn(4).astype(np.float32)
    return q / np.linalg.norm(q)


def np_quat_rotate(q, v):
    # rotation via matrix built from the standard quaternion formula
    x, y, z, w = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return R @ v


class TestQuat:
    def test_rotate_matches_matrix_form(self):
        for _ in range(10):
            q = rand_quat()
            v = rng.randn(3).astype(np.float32)
            got = ops.quat_rotate(jnp.array(q), jnp.array(v))
            np.testing.assert_allclose(got, np_quat_rotate(q, v), rtol=1e-5, atol=1e-5)

    def test_rotate_inv_is_inverse(self):
        q = jnp.array(rand_quat())
        v = jnp.array(rng.randn(3).astype(np.float32))
        np.testing.assert_allclose(
            ops.quat_rotate_inv(q, ops.quat_rotate(q, v)), v, rtol=1e-5, atol=1e-5
        )

    def test_mul_composes_rotations(self):
        qa, qb = jnp.array(rand_quat()), jnp.array(rand_quat())
        v = jnp.array(rng.randn(3).astype(np.float32))
        lhs = ops.quat_rotate(ops.quat_mul(qa, qb), v)
        rhs = ops.quat_rotate(qa, ops.quat_rotate(qb, v))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-5)

    def test_axis_angle(self):
        q = ops.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        v = ops.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)

    def test_normalize_guard_no_nan_grad(self):
        g = jax.grad(lambda q: ops.quat_normalize(q).sum())(jnp.zeros(4))
        assert np.all(np.isfinite(g))
        np.testing.assert_allclose(
            ops.quat_normalize(jnp.zeros(4)), [0, 0, 0, 1], atol=0
        )

    def test_batched(self):
        qs = jnp.array([rand_quat() for _ in range(5)])
        vs = jnp.array(rng.randn(5, 3).astype(np.float32))
        out = ops.quat_rotate(qs, vs)
        for i in range(5):
            np.testing.assert_allclose(
                out[i], ops.quat_rotate(qs[i], vs[i]), rtol=1e-5, atol=1e-6
            )


class TestTransform:
    def test_multiply_point(self):
        t = ops.transform(jnp.array([1.0, 2.0, 3.0]), jnp.array(rand_quat()))
        u = ops.transform(jnp.array([-1.0, 0.5, 0.0]), jnp.array(rand_quat()))
        p = jnp.array(rng.randn(3).astype(np.float32))
        lhs = ops.transform_point(ops.transform_multiply(t, u), p)
        rhs = ops.transform_point(t, ops.transform_point(u, p))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-5)

    def test_inverse(self):
        t = ops.transform(jnp.array([1.0, -2.0, 0.5]), jnp.array(rand_quat()))
        ident = ops.transform_multiply(t, ops.transform_inverse(t))
        np.testing.assert_allclose(ident, ops.transform_identity(), atol=1e-6)


class TestSpatial:
    def test_twist_transform_preserves_dot_with_wrench(self):
        # power pairing <twist, wrench> is frame-invariant
        t = ops.transform(jnp.array([0.3, -1.2, 2.0]), jnp.array(rand_quat()))
        tw = jnp.array(rng.randn(6).astype(np.float32))
        wr = jnp.array(rng.randn(6).astype(np.float32))
        p1 = ops.spatial_dot(tw, wr)
        p2 = ops.spatial_dot(
            ops.spatial_transform_twist(t, tw), ops.spatial_transform_wrench(t, wr)
        )
        np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-4)

    def test_inertia_transform_preserves_kinetic_energy(self):
        # KE = 0.5 v^T I v is invariant under the paired twist/inertia maps
        t = ops.transform(jnp.array([0.1, 0.7, -0.4]), jnp.array(rand_quat()))
        A = rng.randn(6, 6).astype(np.float32)
        I_m = jnp.array(A @ A.T + 6 * np.eye(6, dtype=np.float32))
        v_m = jnp.array(rng.randn(6).astype(np.float32))
        # twist in the target frame maps back with the inverse transform
        v_s = ops.spatial_transform_twist(t, v_m)
        I_s = ops.spatial_transform_inertia(t, I_m)
        ke_m = v_m @ I_m @ v_m
        ke_s = v_s @ I_s @ v_s
        np.testing.assert_allclose(ke_m, ke_s, rtol=1e-3)

    def test_safe_normalize(self):
        v = jnp.array([3.0, 0.0, 4.0])
        np.testing.assert_allclose(ops.safe_normalize(v), [0.6, 0.0, 0.8], atol=1e-6)
        g = jax.grad(lambda x: ops.safe_normalize(x).sum())(jnp.zeros(3))
        assert np.all(g == 0.0)

    def test_spatial_cross_jacobi(self):
        a = jnp.array(rng.randn(6).astype(np.float32))
        b = jnp.array(rng.randn(6).astype(np.float32))
        # <a x b, f> = -<b, a x* f> (duality of cross and cross_dual)
        f = jnp.array(rng.randn(6).astype(np.float32))
        lhs = ops.spatial_dot(ops.spatial_cross(a, b), f)
        rhs = -ops.spatial_dot(b, ops.spatial_cross_dual(a, f))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)


class TestLinalg:
    def _spd(self, n):
        A = rng.randn(n, n).astype(np.float32)
        return A @ A.T + n * np.eye(n, dtype=np.float32)

    def test_solve_matches_numpy(self):
        H = jnp.array(self._spd(7))
        reg = jnp.full((7,), 0.05, dtype=jnp.float32)
        b = jnp.array(rng.randn(7).astype(np.float32))
        L = ops.chol_regularized(H, reg)
        x = ops.solve_frozen_chol(H, L, b)
        expect = np.linalg.solve(np.array(H) + 0.05 * np.eye(7), np.array(b))
        np.testing.assert_allclose(x, expect, rtol=1e-4, atol=1e-4)

    def test_frozen_grad_convention(self):
        # adj_b = (H+reg)^-1 g ; adj_H = -adj_b x^T ; adj_L = 0
        n = 5
        H = jnp.array(self._spd(n))
        reg = jnp.full((n,), 0.1, dtype=jnp.float32)
        b = jnp.array(rng.randn(n).astype(np.float32))
        L = ops.chol_regularized(H, reg)

        x, vjp = jax.vjp(lambda h, bb: ops.solve_frozen_chol(h, L, bb), H, b)
        g = jnp.array(rng.randn(n).astype(np.float32))
        adj_H, adj_b = vjp(g)

        Areg = np.array(H) + 0.1 * np.eye(n)
        lam = np.linalg.solve(Areg, np.array(g))
        np.testing.assert_allclose(adj_b, lam, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            adj_H, -np.outer(lam, np.array(x)), rtol=1e-4, atol=1e-4
        )

    def test_batched_solve(self):
        Hs = jnp.array(np.stack([self._spd(6) for _ in range(4)]))
        reg = jnp.full((4, 6), 0.0, dtype=jnp.float32)
        bs = jnp.array(rng.randn(4, 6).astype(np.float32))
        L = ops.chol_regularized(Hs, reg)
        xs = ops.solve_frozen_chol(Hs, L, bs)
        for i in range(4):
            np.testing.assert_allclose(
                xs[i], np.linalg.solve(np.array(Hs[i]), np.array(bs[i])),
                rtol=1e-4, atol=1e-4,
            )
