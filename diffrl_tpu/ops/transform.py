"""Rigid transforms as flat 7-vectors ``[px, py, pz, qx, qy, qz, qw]``.

This matches the reference's ``spatial_transform`` (translation + quaternion,
/root/reference/dflex/dflex/spatial.h:130-180) flattened the same way the
reference stores them in Model tensors (model.py:1832, util.py:216-218).
Flat arrays batch trivially under vmap/scan, unlike (p, q) tuples.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import (
    quat_identity,
    quat_inverse,
    quat_mul,
    quat_rotate,
)


def transform(p, q):
    p = jnp.asarray(p, dtype=jnp.float32)
    q = jnp.asarray(q, dtype=jnp.float32)
    p, _ = jnp.broadcast_arrays(p, q[..., :3])
    return jnp.concatenate([p, q], axis=-1)


def transform_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=dtype)


def transform_get_translation(t):
    return t[..., 0:3]


def transform_get_rotation(t):
    return t[..., 3:7]


def transform_multiply(t, u):
    """Compose: result = t * u (spatial.h:175-178, util.py:211-212)."""
    p = quat_rotate(t[..., 3:7], u[..., 0:3]) + t[..., 0:3]
    q = quat_mul(t[..., 3:7], u[..., 3:7])
    return jnp.concatenate([p, q], axis=-1)


def transform_inverse(t):
    """Inverse transform (sim.py:1105-1112 semantics)."""
    q_inv = quat_inverse(t[..., 3:7])
    p = -quat_rotate(q_inv, t[..., 0:3])
    return jnp.concatenate([p, q_inv], axis=-1)


def transform_point(t, x):
    """Transform a point: p + R x (spatial.h:182-186)."""
    return t[..., 0:3] + quat_rotate(t[..., 3:7], x)


def transform_vector(t, x):
    """Rotate a vector (no translation)."""
    return quat_rotate(t[..., 3:7], x)
