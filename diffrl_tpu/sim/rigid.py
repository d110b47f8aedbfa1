"""Maximal-coordinate rigid bodies.

The reference keeps two rigid-body representations: the joint-space
articulation pipeline the envs use (sim/articulation.py here) and a
maximal-coordinate one — per-body (x, r, v, w) state with semi-implicit
integration (integrate_rigids, /root/reference/dflex/dflex/sim.py:98-153)
and ground contacts (eval_rigid_contacts, sim.py:999-1073). These are the
batched JAX equivalents; bodies (or envs of single bodies) batch over the
leading axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import quat_mul, quat_normalize, quat_rotate, quat_rotate_inv

_N = jnp.array([0.0, 1.0, 0.0])


def integrate_rigids(x, r, v, w, f, t, inv_m, inv_I, gravity, dt):
    """Semi-implicit Euler in maximal coordinates (integrate_rigids,
    sim.py:98-153). inv_I is the body-frame inverse inertia [..., 3, 3];
    gravity only acts on dynamic bodies (nonzero inv mass, zero-grad mask).

    Returns (x', r', v', w').
    """
    dynamic = (inv_m > 0.0).astype(x.dtype)[..., None]

    v1 = v + (f * inv_m[..., None] + gravity * dynamic) * dt
    x1 = x + v1 * dt

    # rotate angular quantities into the body frame, integrate, rotate back
    wb = quat_rotate_inv(r, w)
    tb = quat_rotate_inv(r, t)
    w1 = quat_rotate(r, wb + jnp.einsum("...ij,...j->...i", inv_I, tb) * dt)
    dr = quat_mul(
        jnp.concatenate([w1, jnp.zeros_like(w1[..., :1])], axis=-1), r
    )
    r1 = quat_normalize(r + dr * 0.5 * dt)
    return x1, r1, v1, w1


def eval_rigid_contacts(x, r, v, w, contact_body, contact_point, contact_dist,
                        contact_mat):
    """Ground contacts for maximal-coordinate bodies (eval_rigid_contacts,
    sim.py:999-1073): penalty normal + damping + box Coulomb friction.

    contact_*: per contact point; contact_mat is [K, 4] (ke, kd, kf, mu).
    Returns (force [B, 3], torque [B, 3]) accumulated per body.
    """
    B = x.shape[0]
    xb = x[contact_body]
    rb = r[contact_body]
    vb = v[contact_body]
    wb = w[contact_body]

    ke, kd, kf, mu = (contact_mat[:, i] for i in range(4))

    p = xb + quat_rotate(rb, contact_point) - _N * contact_dist[:, None]
    arm = p - xb
    dpdt = vb + jnp.cross(wb, arm)

    c = jnp.minimum(jnp.sum(_N * p, axis=-1), 0.0)
    vn = jnp.sum(_N * dpdt, axis=-1)
    vt = dpdt - _N * vn[:, None]

    fn = c * ke
    step_c = (c < 0.0).astype(x.dtype)
    fd = jnp.minimum(vn, 0.0) * kd * step_c

    lower = mu * (fn + fd)
    upper = -lower
    vx = jnp.clip(kf * vt[:, 0], lower, upper)
    vz = jnp.clip(kf * vt[:, 2], lower, upper)
    ft = jnp.stack([vx, jnp.zeros_like(vx), vz], axis=-1) * step_c[:, None]

    f_total = _N * (fn + fd)[:, None] + ft
    t_total = jnp.cross(arm, f_total)

    f_out = jax.ops.segment_sum(-f_total, contact_body, num_segments=B)
    t_out = jax.ops.segment_sum(-t_total, contact_body, num_segments=B)
    return f_out, t_out
