"""Shared observation machinery for free-base locomotion envs (Ant/Humanoid/
SNUHumanoid), mirroring /root/reference/envs/ant.py:266-293."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import quat_mul, quat_rotate, safe_normalize


def torso_observations(joint_q, joint_qd, inv_start_rot, targets, start_pos):
    """Returns (height, torso_rot, lin_vel, ang_vel, up_vec_y, heading_proj).

    lin_vel converts the spatial twist's linear part to the world-frame
    velocity of the body origin (envs/ant.py:272-273).
    """
    torso_pos = joint_q[0:3]
    torso_rot = joint_q[3:7]
    lin_vel = joint_qd[3:6]
    ang_vel = joint_qd[0:3]

    lin_vel = lin_vel - jnp.cross(torso_pos, ang_vel)

    to_target = targets + start_pos - torso_pos
    to_target = to_target.at[1].set(0.0)
    target_dirs = safe_normalize(to_target)

    torso_quat = quat_mul(torso_rot, inv_start_rot)
    up_vec = quat_rotate(torso_quat, jnp.array([0.0, 1.0, 0.0]))
    heading_vec = quat_rotate(torso_quat, jnp.array([1.0, 0.0, 0.0]))
    heading_proj = jnp.sum(heading_vec * target_dirs)

    return torso_pos, torso_rot, lin_vel, ang_vel, up_vec[1], heading_proj
