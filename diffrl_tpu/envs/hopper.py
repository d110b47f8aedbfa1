"""Hopper env, planar base (reference: /root/reference/envs/hopper.py)."""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..sim import ModelBuilder
from ..sim.importers.mjcf import parse_mjcf
from ..sim.model import np_quat_from_axis_angle, np_transform
from .base import DiffEnv

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class HopperEnv(DiffEnv):
    num_obs = 11
    num_acts = 3

    dt = 1.0 / 60.0
    sim_substeps = 16

    termination_height = -0.45
    termination_angle = np.pi / 6.0
    termination_height_tolerance = 0.15
    termination_angle_tolerance = 0.05
    height_rew_scale = 1.0
    action_strength = 200.0
    action_penalty = -1e-1

    def __init__(self, num_envs=4096, seed=0, episode_length=1000,
                 stochastic_init=False, MM_caching_frequency=1,
                 early_termination=True, **kw):
        super().__init__(
            num_envs=num_envs, seed=seed, episode_length=episode_length,
            stochastic_init=stochastic_init,
            MM_caching_frequency=MM_caching_frequency,
            early_termination=early_termination, **kw,
        )

    def build_model(self):
        builder = ModelBuilder()
        parse_mjcf(
            os.path.join(_ASSETS, "hopper.xml"),
            builder,
            density=1000.0,
            stiffness=0.0,
            damping=2.0,
            contact_ke=2.0e4,
            contact_kd=1.0e3,
            contact_kf=1.0e3,
            contact_mu=0.9,
            limit_ke=1.0e3,
            limit_kd=1.0e1,
            armature=1.0,
            radians=True,
            load_stiffness=True,
        )
        # tilt the planar base into the y-up world (envs/hopper.py:110)
        builder.joint_X_pj[0] = np_transform(
            (0.0, 0.0, 0.0), np_quat_from_axis_angle((1.0, 0.0, 0.0), -math.pi * 0.5)
        )
        model = builder.finalize()
        return dataclasses.replace(
            model, ground=True, gravity=jnp.array([0.0, -9.81, 0.0])
        )

    def action_to_controls(self, actions):
        joint_act = jnp.zeros((self.model.dof_count,))
        joint_act = joint_act.at[3:].set(actions * self.action_strength)
        return joint_act, None

    def observations(self, joint_q, joint_qd, actions):
        return jnp.concatenate([joint_q[1:], joint_qd])

    def reward(self, obs, actions):
        height_diff = obs[0] - (self.termination_height + self.termination_height_tolerance)
        height_reward = jnp.clip(height_diff, -1.0, 0.3)
        height_reward = jnp.where(height_reward < 0.0, -200.0 * height_reward ** 2, height_reward)
        height_reward = jnp.where(height_reward > 0.0, self.height_rew_scale * height_reward, height_reward)

        angle_reward = 1.0 * (-(obs[1] ** 2) / (self.termination_angle ** 2) + 1.0)
        progress_reward = obs[5]
        return (
            progress_reward + height_reward + angle_reward
            + jnp.sum(actions ** 2) * self.action_penalty
        )

    def termination(self, obs):
        return obs[0] < self.termination_height

    def initial_state(self, key):
        q0 = self.model.joint_q_init
        qd0 = jnp.zeros_like(self.model.joint_qd_init)
        if self.stochastic_init:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            base = q0[0:2] + 0.05 * (jax.random.uniform(k1, (2,)) - 0.5) * 2.0
            rot = (jax.random.uniform(k2, (1,)) - 0.5) * 0.1
            joints = q0[3:] + 0.05 * (jax.random.uniform(k3, (self.model.coord_count - 3,)) - 0.5) * 2.0
            q0 = jnp.concatenate([base, rot, joints])
            qd0 = 0.05 * (jax.random.uniform(k4, qd0.shape) - 0.5) * 2.0
        return q0, qd0
