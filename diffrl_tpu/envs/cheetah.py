"""Half-cheetah env, planar base (reference: /root/reference/envs/cheetah.py)."""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp

from ..sim import ModelBuilder
from ..sim.importers.mjcf import parse_mjcf
from ..sim.model import np_quat_from_axis_angle, np_transform
from .base import DiffEnv

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class CheetahEnv(DiffEnv):
    num_obs = 17
    num_acts = 6

    dt = 1.0 / 60.0
    sim_substeps = 16

    action_strength = 200.0
    action_penalty = -0.1
    start_height = -0.2

    def __init__(self, num_envs=4096, seed=0, episode_length=1000,
                 stochastic_init=False, MM_caching_frequency=1,
                 early_termination=False, **kw):
        super().__init__(
            num_envs=num_envs, seed=seed, episode_length=episode_length,
            stochastic_init=stochastic_init,
            MM_caching_frequency=MM_caching_frequency,
            early_termination=early_termination, **kw,
        )

    def build_model(self):
        builder = ModelBuilder()
        parse_mjcf(
            os.path.join(_ASSETS, "half_cheetah.xml"),
            builder,
            density=1000.0,
            stiffness=0.0,
            damping=1.0,
            contact_ke=2.0e4,
            contact_kd=1.0e3,
            contact_kf=1.0e3,
            contact_mu=1.0,
            limit_ke=1.0e3,
            limit_kd=1.0e1,
            armature=0.1,
            radians=True,
            load_stiffness=True,
        )
        # raise + tilt the planar base (envs/cheetah.py:108)
        builder.joint_X_pj[0] = np_transform(
            (0.0, 1.0, 0.0), np_quat_from_axis_angle((1.0, 0.0, 0.0), -math.pi * 0.5)
        )
        builder.joint_q[1] = self.start_height
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
        progress_reward = obs[8]
        return progress_reward + jnp.sum(actions ** 2) * self.action_penalty

    def initial_state(self, key):
        q0 = self.model.joint_q_init
        qd0 = jnp.zeros_like(self.model.joint_qd_init)
        if self.stochastic_init:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            base = q0[0:2] + 0.1 * (jax.random.uniform(k1, (2,)) - 0.5) * 2.0
            rot = (jax.random.uniform(k2, (1,)) - 0.5) * 0.2
            joints = q0[3:] + 0.1 * (jax.random.uniform(k3, (self.model.coord_count - 3,)) - 0.5) * 2.0
            q0 = jnp.concatenate([base, rot, joints])
            qd0 = 0.5 * (jax.random.uniform(k4, qd0.shape) - 0.5)
        return q0, qd0
