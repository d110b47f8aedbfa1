"""Humanoid env (reference: /root/reference/envs/humanoid.py)."""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quat_conjugate, quat_from_angle_axis, quat_mul, safe_normalize
from ..sim import ModelBuilder
from ..sim.importers.mjcf import parse_mjcf
from ..sim.model import np_quat_from_axis_angle
from .base import DiffEnv
from .locomotion import torso_observations

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")

_MOTOR_STRENGTHS = (
    200, 200, 200, 200, 200, 600, 400, 100, 100, 200, 200,
    600, 400, 100, 100, 100, 100, 200, 100, 100, 200,
)


class HumanoidEnv(DiffEnv):
    num_obs = 76
    num_acts = 21

    # asset + per-joint motor gains; subclasses (e.g. the tiny CI variant)
    # override these with a reduced topology and matching gain list
    asset_file = os.path.join(_ASSETS, "humanoid.xml")
    motor_strength_list = _MOTOR_STRENGTHS

    dt = 1.0 / 60.0
    sim_substeps = 48

    termination_height = 0.74
    motor_scale = 0.35
    action_penalty = -0.002
    joint_vel_obs_scaling = 0.1
    termination_tolerance = 0.1
    height_rew_scale = 10.0
    start_height = 1.35

    def __init__(self, num_envs=4096, seed=0, episode_length=1000,
                 stochastic_init=False, MM_caching_frequency=1,
                 early_termination=True, **kw):
        super().__init__(
            num_envs=num_envs, seed=seed, episode_length=episode_length,
            stochastic_init=stochastic_init,
            MM_caching_frequency=MM_caching_frequency,
            early_termination=early_termination, **kw,
        )
        self.start_rotation = jnp.asarray(
            np_quat_from_axis_angle((1.0, 0.0, 0.0), -math.pi * 0.5),
            dtype=jnp.float32,
        )
        self.inv_start_rot = quat_conjugate(self.start_rotation)
        self.start_pos = jnp.array([0.0, self.start_height, 0.0])
        self.targets = jnp.array([200.0, 0.0, 0.0])
        self.motor_strengths = jnp.asarray(
            self.motor_strength_list, dtype=jnp.float32
        )
        # obs layout (observations() below): 11 torso + (nq-7) joint pos +
        # (nqd-6) scaled joint vel + up/heading + actions; = 76/21 for the
        # reference asset, derived so reduced-topology subclasses stay
        # consistent
        self.num_acts = self.model.dof_count - 6
        self.num_obs = (
            11 + (self.model.coord_count - 7) + (self.model.dof_count - 6)
            + 2 + self.num_acts
        )
        if len(self.motor_strength_list) != self.num_acts:
            raise ValueError("motor_strength_list must have one gain per "
                             "actuated dof")

    def build_model(self):
        builder = ModelBuilder()
        parse_mjcf(
            self.asset_file,
            builder,
            stiffness=5.0,
            damping=0.1,
            contact_ke=2.0e4,
            contact_kd=5.0e3,
            contact_kf=1.0e3,
            contact_mu=0.75,
            limit_ke=1.0e3,
            limit_kd=1.0e1,
            armature=0.007,
            load_stiffness=True,
            load_armature=True,
        )
        builder.joint_q[0:3] = [0.0, self.start_height, 0.0]
        builder.joint_q[3:7] = list(np_quat_from_axis_angle((1.0, 0.0, 0.0), -math.pi * 0.5))
        model = builder.finalize()
        return dataclasses.replace(
            model, ground=True, gravity=jnp.array([0.0, -9.81, 0.0])
        )

    def action_to_controls(self, actions):
        joint_act = jnp.zeros((self.model.dof_count,))
        joint_act = joint_act.at[6:].set(
            actions * self.motor_scale * self.motor_strengths
        )
        return joint_act, None

    def observations(self, joint_q, joint_qd, actions):
        torso_pos, torso_rot, lin_vel, ang_vel, up_y, heading = torso_observations(
            joint_q, joint_qd, self.inv_start_rot, self.targets, self.start_pos
        )
        return jnp.concatenate(
            [
                torso_pos[1:2],                                 # 0
                torso_rot,                                      # 1:5
                lin_vel,                                        # 5:8
                ang_vel,                                        # 8:11
                joint_q[7:],                                    # 11:32
                self.joint_vel_obs_scaling * joint_qd[6:],      # 32:53
                up_y[None],                                     # 53
                heading[None],                                  # 54
                actions,                                        # 55:76
            ]
        )

    def reward(self, obs, actions):
        up_reward = 0.1 * obs[53]
        heading_reward = obs[54]

        height_diff = obs[0] - (self.termination_height + self.termination_tolerance)
        height_reward = jnp.clip(height_diff, -1.0, self.termination_tolerance)
        height_reward = jnp.where(height_reward < 0.0, -200.0 * height_reward ** 2, height_reward)
        height_reward = jnp.where(height_reward > 0.0, self.height_rew_scale * height_reward, height_reward)

        progress_reward = obs[5]
        return (
            progress_reward + up_reward + heading_reward + height_reward
            + jnp.sum(actions ** 2) * self.action_penalty
        )

    def termination(self, obs):
        # reference applies the height cut unconditionally (humanoid.py:361)
        return obs[0] < self.termination_height

    def invalid_mask(self, obs, joint_q, joint_qd):
        bad = (
            jnp.any(~jnp.isfinite(obs))
            | jnp.any(~jnp.isfinite(joint_q))
            | jnp.any(~jnp.isfinite(joint_qd))
            | jnp.any(jnp.abs(joint_q) > 1e6)
            | jnp.any(jnp.abs(joint_qd) > 1e6)
        )
        return bad

    def zero_reward_on_invalid(self):
        # the SNU defense (snu_humanoid.py:423-432) extended to Humanoid:
        # without it one blown-up state's NaN reward poisons the episode
        # trackers and the window's actor loss for hundreds of epochs
        # (observed at epoch ~460 of a 2000-epoch run); the invalid mask
        # already force-resets the env, so zeroing its reward is the
        # consistent treatment. The reference instead crashes on the
        # resulting NaN grad norm (shac.py:421-423).
        return True

    def initial_state(self, key):
        q0 = self.model.joint_q_init
        qd0 = jnp.zeros_like(self.model.joint_qd_init)
        if self.stochastic_init:
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            pos = q0[0:3] + 0.1 * (jax.random.uniform(k1, (3,)) - 0.5) * 2.0
            angle = (jax.random.uniform(k2, ()) - 0.5) * np.pi / 12.0
            axis = safe_normalize(jax.random.uniform(k3, (3,)) - 0.5)
            rot = quat_mul(q0[3:7], quat_from_angle_axis(angle, axis))
            joints = q0[7:] + 0.2 * (jax.random.uniform(k4, (self.model.coord_count - 7,)) - 0.5) * 2.0
            q0 = jnp.concatenate([pos, rot, joints])
            qd0 = 0.5 * (jax.random.uniform(k5, qd0.shape) - 0.5)
        return q0, qd0
