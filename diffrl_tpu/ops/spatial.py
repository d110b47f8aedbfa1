"""6D spatial algebra (Featherstone / Frank & Park conventions).

Spatial vectors are flat 6-vectors ``[w(3), v(3)]`` — angular on top, linear
on the bottom, matching the reference's ``spatial_vector``
(/root/reference/dflex/dflex/spatial.h:5-28). Spatial matrices are 6x6.
All ops broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from .linalg import matvec_small
from .quat import quat_identity, quat_rotate, quat_to_matrix
from .transform import transform_inverse

_EPS = 1.0e-6


def spatial_vector(w, v):
    return jnp.concatenate([jnp.asarray(w), jnp.asarray(v)], axis=-1)


def spatial_top(a):
    return a[..., 0:3]


def spatial_bottom(a):
    return a[..., 3:6]


def spatial_dot(a, b):
    return jnp.sum(a * b, axis=-1)


def spatial_cross(a, b):
    """Motion x motion cross product (spatial.h:55-61)."""
    w = jnp.cross(a[..., 0:3], b[..., 0:3])
    v = jnp.cross(a[..., 3:6], b[..., 0:3]) + jnp.cross(a[..., 0:3], b[..., 3:6])
    return jnp.concatenate([w, v], axis=-1)


def spatial_cross_dual(a, b):
    """Motion x* force cross product (spatial.h:63-69)."""
    w = jnp.cross(a[..., 0:3], b[..., 0:3]) + jnp.cross(a[..., 3:6], b[..., 3:6])
    v = jnp.cross(a[..., 0:3], b[..., 3:6])
    return jnp.concatenate([w, v], axis=-1)


def spatial_transform_twist(t, x):
    """Change-of-frame for a twist (sim.py:1076-1088, Frank & Park 3.20)."""
    q = t[..., 3:7]
    p = t[..., 0:3]
    w = quat_rotate(q, x[..., 0:3])
    v = quat_rotate(q, x[..., 3:6]) + jnp.cross(p, w)
    return jnp.concatenate([w, v], axis=-1)


def spatial_transform_wrench(t, x):
    """Change-of-frame for a wrench (sim.py:1091-1103)."""
    q = t[..., 3:7]
    p = t[..., 0:3]
    v = quat_rotate(q, x[..., 3:6])
    w = quat_rotate(q, x[..., 0:3]) + jnp.cross(p, v)
    return jnp.concatenate([w, v], axis=-1)


def skew(v):
    """Skew-symmetric cross-product matrix of vec3."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def spatial_adjoint(R, S):
    """6x6 adjoint from rotation block R and lower-left block S
    (spatial.h:559-585): ``[[R, 0], [S, R]]``."""
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, zeros], axis=-1)
    bot = jnp.concatenate([S, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spatial_transform_inertia(t, I):
    """Express a body-frame spatial inertia in the parent/space frame.

    Computes ``T^T I T`` with ``T = Ad(t^-1)`` (tensor change of coordinates,
    Frank & Park sec. 8.2.3; sim.py:1117-1134). Differentiable end-to-end —
    the reference leaves this adjoint unimplemented (spatial.h:adj_spatial_
    transform_inertia is a nop), so gradients through I_s are an improvement,
    not a deviation: in the reference I_s feeds the mass matrix whose
    Cholesky backward is also frozen.
    """
    t_inv = transform_inverse(t)
    q = t_inv[..., 3:7]
    p = t_inv[..., 0:3]
    R = jnp.stack(
        [
            quat_rotate(q, jnp.array([1.0, 0.0, 0.0], dtype=t.dtype)),
            quat_rotate(q, jnp.array([0.0, 1.0, 0.0], dtype=t.dtype)),
            quat_rotate(q, jnp.array([0.0, 0.0, 1.0], dtype=t.dtype)),
        ],
        axis=-1,
    )
    S = jnp.matmul(skew(p), R)
    T = spatial_adjoint(R, S)
    return jnp.matmul(jnp.matmul(jnp.swapaxes(T, -1, -2), I), T)


def spatial_inertia_matvec(t, I_m, x):
    """Apply the space-frame spatial inertia to a twist WITHOUT materializing
    the 6x6: equals ``spatial_transform_inertia(t, I_m) @ x`` exactly
    (T x = twist(t^-1, x); T^T y = wrench(t, y); I_m block-diagonal).

    Why: under vmap the materialized [E, 6, 6] tensor is padded by TPU
    tiling to [E, 8, 128] — a 21x HBM blowup that profiling showed dominating
    the substep. This form stays on [E, 3]/[E, 6] vectors.
    """
    u = spatial_transform_twist(transform_inverse(t), x)
    I3 = I_m[..., 0:3, 0:3]
    m = I_m[..., 3, 3]
    y = jnp.concatenate(
        [
            matvec_small(I3, u[..., 0:3]),
            m[..., None] * u[..., 3:6],
        ],
        axis=-1,
    )
    return spatial_transform_wrench(t, y)


def safe_normalize(v, eps: float = _EPS):
    """Normalize vec3 with zero output AND zero gradient at ||v|| <= eps.

    Mirrors the reference ``normalize`` primal (vec3.h guarded) while avoiding
    NaN gradients at the origin (double-where pattern); the reference adjoint
    likewise produces 0 there.
    """
    l2 = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = l2 > eps * eps
    inv = jnp.where(safe, 1.0 / jnp.sqrt(jnp.where(safe, l2, 1.0)), 0.0)
    return v * inv
