"""CartPole swing-up (reference: /root/reference/envs/cartpole_swing_up.py)."""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from ..sim import ModelBuilder
from ..sim.importers.urdf import urdf_load
from ..sim.model import np_quat_from_axis_angle, np_transform
from .base import DiffEnv

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class CartPoleSwingUpEnv(DiffEnv):
    num_obs = 5
    num_acts = 1

    dt = 1.0 / 60.0
    sim_substeps = 4

    action_strength = 1000.0
    pole_angle_penalty = 1.0
    pole_velocity_penalty = 0.1
    cart_position_penalty = 0.05
    cart_velocity_penalty = 0.1
    cart_action_penalty = 0.0

    def __init__(self, num_envs=1024, seed=0, episode_length=240,
                 stochastic_init=False, MM_caching_frequency=1,
                 early_termination=False, **kw):
        super().__init__(
            num_envs=num_envs, seed=seed, episode_length=episode_length,
            stochastic_init=stochastic_init,
            MM_caching_frequency=MM_caching_frequency,
            early_termination=early_termination, **kw,
        )

    def build_model(self):
        import dataclasses

        builder = ModelBuilder()
        urdf_load(
            builder,
            os.path.join(_ASSETS, "cartpole.urdf"),
            np_transform(
                (0.0, 2.5, 0.0),
                np_quat_from_axis_angle((1.0, 0.0, 0.0), -math.pi * 0.5),
            ),
            floating=False,
            shape_kd=1.0e4,
            limit_kd=1.0,
        )
        builder.joint_q[1] = -math.pi  # pole starts hanging down
        model = builder.finalize()
        return dataclasses.replace(
            model, ground=False, gravity=jnp.array([0.0, -9.81, 0.0])
        )

    def action_to_controls(self, actions):
        joint_act = jnp.zeros((self.model.dof_count,))
        joint_act = joint_act.at[0].set(actions[0] * self.action_strength)
        return joint_act, None

    def observations(self, joint_q, joint_qd, actions):
        x, theta = joint_q[0], joint_q[1]
        xdot, theta_dot = joint_qd[0], joint_qd[1]
        return jnp.stack([x, xdot, jnp.sin(theta), jnp.cos(theta), theta_dot])

    def reward(self, obs, actions):
        x, xdot, theta_dot = obs[0], obs[1], obs[4]
        theta = jnp.arctan2(obs[2], obs[3])  # normalize_angle(joint_q[1])
        return (
            -(theta ** 2) * self.pole_angle_penalty
            - (theta_dot ** 2) * self.pole_velocity_penalty
            - (x ** 2) * self.cart_position_penalty
            - (xdot ** 2) * self.cart_velocity_penalty
            - jnp.sum(actions ** 2) * self.cart_action_penalty
        )

    def initial_state(self, key):
        q0 = self.model.joint_q_init
        qd0 = self.model.joint_qd_init
        if self.stochastic_init:
            kq, kqd = jax.random.split(key)
            q0 = q0 + math.pi * (jax.random.uniform(kq, q0.shape) - 0.5)
            qd0 = qd0 + 0.5 * (jax.random.uniform(kqd, qd0.shape) - 0.5)
        return q0, qd0
