"""Stateful environment adapter — reference DFlexEnv API parity.

The reference exposes a stateful vectorized env
(/root/reference/envs/dflex_env.py:21-109): ``obs = env.reset()``,
``obs, rew, done, info = env.step(actions)``, plus the gradient-window
helpers ``clear_grad()`` / ``initialize_trajectory()`` / ``get_checkpoint()``.
diffrl_tpu's envs are pure functions over an EnvState pytree (the natural
JAX form); this wrapper carries that state internally so code written
against the reference API (including external RL libraries) runs unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

try:
    from gymnasium import spaces as _spaces
except Exception:  # pragma: no cover - gymnasium is available in this image
    _spaces = None

import numpy as np

from .base import DiffEnv, EnvState


class StatefulEnv:
    """Wraps a functional DiffEnv with carried state (DFlexEnv surface)."""

    def __init__(self, env: DiffEnv, seed: int = 0):
        self.env = env
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        self.state: Optional[EnvState] = None
        self._step = jax.jit(env.step)
        self.extras: Dict[str, Any] = {}

        if _spaces is not None:
            ones_o = np.ones(env.num_obs, dtype=np.float32) * np.inf
            ones_a = np.ones(env.num_acts, dtype=np.float32)
            self.observation_space = _spaces.Box(-ones_o, ones_o)
            self.action_space = _spaces.Box(-ones_a, ones_a)

    # -- reference DFlexEnv properties ---------------------------------------

    @property
    def num_envs(self):
        return self.env.num_envs

    @property
    def num_obs(self):
        return self.env.num_obs

    @property
    def num_actions(self):
        return self.env.num_acts

    @property
    def episode_length(self):
        return self.env.episode_length

    # -- stateful API ---------------------------------------------------------

    def reset(self, force_reset: bool = True):
        if self.state is None or force_reset:
            # fresh randomness per reset (the reference draws new stochastic
            # initial states each time, envs/dflex_env.py); the first reset
            # reproduces PRNGKey(seed) behavior via the carried key
            self._key, sub = jax.random.split(self._key)
            self.state = self.env.reset(sub)
        return self.env.batch_observations(self.state)

    def step(self, actions):
        assert self.state is not None, "call reset() first"
        self.state, obs, rew, done, info = self._step(self.state, actions)
        self.extras = info
        return obs, rew, done, info

    def clear_grad(self):
        """Detach the carried state from any traced history
        (envs/ant.py:230-249). Pure-JAX states carry no graph outside a
        trace, so this is stop_gradient for in-trace use + a no-op outside."""
        if self.state is not None:
            self.state = lax.stop_gradient(self.state)

    def initialize_trajectory(self):
        """Graph-cut + current observations (envs/ant.py:251-255)."""
        self.clear_grad()
        return self.env.batch_observations(self.state)

    def get_checkpoint(self):
        """Snapshot of the carried sim state (envs/dflex_env.py parity)."""
        return jax.tree.map(jnp.copy, self.state)

    def load_checkpoint(self, ckpt):
        self.state = ckpt
