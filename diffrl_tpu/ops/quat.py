"""Quaternion operations (pure jnp, batch-polymorphic).

Convention: quaternions are stored as ``[x, y, z, w]`` (imaginary part first,
real part last), matching the reference engine's layout
(/root/reference/dflex/dflex/quat.h:3-14) so that recorded trajectories and
assets are directly comparable.

All functions broadcast over leading batch dimensions: a "quat" is any array
whose last axis has size 4, a "vec3" any array whose last axis has size 3.
Everything here is differentiable with ``jax.grad``; where the reference
defines a guarded primal (e.g. ``normalize`` returning identity for tiny
norms, quat.h:70-83) we reproduce both the primal value and a non-NaN
gradient via the double-``where`` pattern.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1.0e-6


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat(x, y, z, w):
    return jnp.stack(jnp.broadcast_arrays(*map(jnp.asarray, (x, y, z, w))), axis=-1)


def quat_from_axis_angle(axis, angle):
    """Unit quaternion from (unnormalized ok) axis and angle (quat.h:44-53)."""
    axis = jnp.asarray(axis, dtype=jnp.float32)
    angle = jnp.asarray(angle, dtype=jnp.float32)
    half = angle * 0.5
    w = jnp.cos(half)
    s = jnp.sin(half)
    v = axis * s[..., None]
    return jnp.concatenate([v, w[..., None]], axis=-1)


def quat_mul(a, b):
    """Hamilton product, (x,y,z,w) layout (quat.h:100-106)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + bw * ax + ay * bz - by * az,
            aw * by + bw * ay + az * bx - bz * ax,
            aw * bz + bw * az + ax * by - bx * ay,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


# the reference calls conjugation "inverse" (unit quats assumed, quat.h:85-88)
quat_inverse = quat_conjugate


def quat_rotate(q, v):
    """Rotate vec3 v by quaternion q (quat.h:113-116)."""
    qv = q[..., 0:3]
    w = q[..., 3:4]
    return (
        v * (2.0 * w * w - 1.0)
        + jnp.cross(qv, v) * w * 2.0
        + qv * jnp.sum(qv * v, axis=-1, keepdims=True) * 2.0
    )


def quat_rotate_inv(q, v):
    """Rotate by the inverse rotation (quat.h:118-121)."""
    qv = q[..., 0:3]
    w = q[..., 3:4]
    return (
        v * (2.0 * w * w - 1.0)
        - jnp.cross(qv, v) * w * 2.0
        + qv * jnp.sum(qv * v, axis=-1, keepdims=True) * 2.0
    )


def quat_normalize(q):
    """Normalize with the reference's tiny-norm guard (quat.h:70-83).

    Returns identity when |q| <= eps; gradient is zero there instead of NaN.
    """
    l2 = jnp.sum(q * q, axis=-1, keepdims=True)
    safe = l2 > _EPS * _EPS
    l = jnp.sqrt(jnp.where(safe, l2, 1.0))
    out = jnp.where(safe, q / l, quat_identity(q.dtype))
    return out


def quat_to_matrix(q):
    """3x3 rotation matrix with columns = rotated basis vectors."""
    c1 = quat_rotate(q, jnp.array([1.0, 0.0, 0.0], dtype=q.dtype))
    c2 = quat_rotate(q, jnp.array([0.0, 1.0, 0.0], dtype=q.dtype))
    c3 = quat_rotate(q, jnp.array([0.0, 0.0, 1.0], dtype=q.dtype))
    return jnp.stack([c1, c2, c3], axis=-1)


def quat_from_angle_axis(angle, axis):
    """torch_utils.py:quat_from_angle_axis parity: axis assumed normalized."""
    return quat_from_axis_angle(axis, angle)
