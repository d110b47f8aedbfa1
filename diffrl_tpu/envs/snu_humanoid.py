"""SNU lower-body humanoid with 152 MTU muscles
(reference: /root/reference/envs/snu_humanoid.py)."""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quat_conjugate, quat_from_angle_axis, quat_mul, safe_normalize
from ..sim import ModelBuilder
from ..sim.importers.snu import SnuGains, load_snu
from ..sim.model import np_quat_from_axis_angle
from .base import DiffEnv
from .locomotion import torso_observations

_ASSETS = os.path.join(os.path.dirname(__file__), "assets", "snu")

_FILTER = {
    "Pelvis", "FemurR", "TibiaR", "TalusR", "FootThumbR", "FootPinkyR",
    "FemurL", "TibiaL", "TalusL", "FootThumbL", "FootPinkyL",
}


class SNUHumanoidEnv(DiffEnv):
    dt = 1.0 / 60.0
    sim_substeps = 48

    # bones kept from the full skeleton (reference builds the lower body
    # only, snu_humanoid.py:34); subclasses may shrink this further (the
    # tiny CI variant exercises the same muscle/ball-joint code paths on a
    # 3-bone topology)
    body_filter = _FILTER

    termination_height = 0.46
    termination_tolerance = 0.05
    height_rew_scale = 4.0
    action_strength = 100.0
    action_penalty = -0.001
    joint_vel_obs_scaling = 0.1
    str_scale = 0.6
    start_height = 1.0

    mtu_actuations = True

    def __init__(self, num_envs=4096, seed=0, episode_length=1000,
                 stochastic_init=False, MM_caching_frequency=1,
                 early_termination=True, mtu_actuations=True, **kw):
        self.mtu_actuations = mtu_actuations
        super().__init__(
            num_envs=num_envs, seed=seed, episode_length=episode_length,
            stochastic_init=stochastic_init,
            MM_caching_frequency=MM_caching_frequency,
            early_termination=early_termination, **kw,
        )
        self.num_acts = (
            self.model.topology.muscle_count if mtu_actuations
            else self.model.dof_count - 6
        )
        # obs layout (observations() below): 11 torso + (nq-7) joint pos +
        # (nqd-6) scaled joint vel + up/heading (+ actions in torque mode).
        # = 53 MTU / 71 torque for the reference lower-body skeleton
        # (snu_humanoid.py:44-59); derived from the model so reduced-topology
        # subclasses get consistent dims
        self.num_obs = (
            11 + (self.model.coord_count - 7) + (self.model.dof_count - 6) + 2
            + (0 if mtu_actuations else self.num_acts)
        )
        self.start_rotation = jnp.asarray(
            np_quat_from_axis_angle((0.0, 1.0, 0.0), math.pi * 0.5),
            dtype=jnp.float32,
        )
        self.inv_start_rot = quat_conjugate(self.start_rotation)
        self.start_pos = jnp.array([0.0, self.start_height, 0.0])
        self.targets = jnp.array([10000.0, 0.0, 0.0])
        # NOTE: the reference scales f0 by str_scale twice
        # (snu_humanoid.py:173-178); reproduced for parity
        strengths = [
            self.str_scale * self.str_scale * m.muscle_strength
            for m in self.skeleton.muscles
        ]
        self.muscle_strengths = jnp.asarray(strengths, dtype=jnp.float32)

    def build_model(self):
        builder = ModelBuilder()
        self.skeleton = load_snu(
            os.path.join(_ASSETS, "human.xml"),
            os.path.join(_ASSETS, "muscle284.xml") if self.mtu_actuations else None,
            builder,
            include=self.body_filter,
            gains=SnuGains(
                joint_stiffness=5.0,
                joint_damping=2.0,
                joint_armature=0.05,
                limit_ke=1.0e3,
                limit_kd=1.0e1,
                shape_ke=5.0e3,
                shape_kd=2.0e3,
                shape_kf=1.0e3,
                shape_mu=0.5,
            ),
        )
        builder.joint_q[0:3] = [0.0, self.start_height, 0.0]
        builder.joint_q[3:7] = list(np_quat_from_axis_angle((0.0, 1.0, 0.0), math.pi * 0.5))
        model = builder.finalize()
        return dataclasses.replace(
            model, ground=True, gravity=jnp.array([0.0, -9.81, 0.0])
        )

    def action_to_controls(self, actions):
        if self.mtu_actuations:
            # [-1,1] -> [0,1] activation x (doubly) scaled strength
            act01 = actions * 0.5 + 0.5
            return None, act01 * self.muscle_strengths
        joint_act = jnp.zeros((self.model.dof_count,))
        joint_act = joint_act.at[6:].set(actions * self.action_strength)
        return joint_act, None

    def observations(self, joint_q, joint_qd, actions):
        torso_pos, torso_rot, lin_vel, ang_vel, up_y, heading = torso_observations(
            joint_q, joint_qd, self.inv_start_rot, self.targets, self.start_pos
        )
        parts = [
            torso_pos[1:2],                               # 0
            torso_rot,                                    # 1:5
            lin_vel,                                      # 5:8
            ang_vel,                                      # 8:11
            joint_q[7:],                                  # 11:33
            self.joint_vel_obs_scaling * joint_qd[6:],    # 33:51
            up_y[None],                                   # 51
            heading[None],                                # 52
        ]
        if not self.mtu_actuations:
            parts.append(actions)
        return jnp.concatenate(parts)

    def reward(self, obs, actions):
        up_reward = 0.1 * obs[51]
        heading_reward = obs[52]
        progress_reward = obs[5]
        act_penalty = jnp.sum(jnp.abs(actions)) * self.action_penalty
        # NOTE: the reference computes a height_reward but does not include
        # it in the final sum (snu_humanoid.py:424) — matched here
        return progress_reward + up_reward + heading_reward + act_penalty

    def termination(self, obs):
        return obs[0] < self.termination_height

    def invalid_mask(self, obs, joint_q, joint_qd):
        return (
            jnp.any(~jnp.isfinite(obs))
            | jnp.any(~jnp.isfinite(joint_q))
            | jnp.any(~jnp.isfinite(joint_qd))
            | jnp.any(jnp.abs(joint_q) > 1e6)
            | jnp.any(jnp.abs(joint_qd) > 1e6)
        )

    def zero_reward_on_invalid(self):
        return True

    def initial_state(self, key):
        q0 = self.model.joint_q_init
        qd0 = jnp.zeros_like(self.model.joint_qd_init)
        if self.stochastic_init:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            pos = q0[0:3] + 0.1 * (jax.random.uniform(k1, (3,)) - 0.5) * 2.0
            angle = (jax.random.uniform(k2, ()) - 0.5) * np.pi / 12.0
            axis = safe_normalize(jax.random.uniform(k3, (3,)) - 0.5)
            rot = quat_mul(q0[3:7], quat_from_angle_axis(angle, axis))
            q0 = jnp.concatenate([pos, rot, q0[7:]])
            qd0 = 0.5 * (jax.random.uniform(k4, qd0.shape) - 0.5)
        return q0, qd0
