"""Functional environment layer.

Redesign of the reference's stateful DFlexEnv (/root/reference/envs/
dflex_env.py:21-109, envs/ant.py:156-255) as pure functions over an EnvState
pytree, so a whole SHAC rollout window is one ``lax.scan`` under ``jit``:

- ``step``: clip actions -> map to joint/muscle actuation -> vmapped
  differentiable sim -> obs/reward/termination -> branchless in-graph partial
  reset (``where(done, stop_gradient(reset_state), state)`` replaces the
  reference's ``.clone()`` + index-assignment dance, envs/ant.py:198-225).
- gradient truncation (``initialize_trajectory``/``clear_grad``) is just
  ``lax.stop_gradient`` on the carried EnvState, applied by the algorithm.
- RNG is an explicit key in EnvState (the reference uses global torch RNG).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..sim import Model, State, simulate
from ..sim.model import _pytree_dataclass, static_field


@jax.custom_vjp
def grad_nan_guard(x):
    """Identity whose backward nan_to_nums the cotangent.

    JAX equivalent of the reference's tensor gradient hooks on
    joint_q/joint_qd (snu_humanoid.py:253-265): once one env's physics
    blows up, reverse-mode through its NaN primals yields NaN cotangents
    regardless of the (zeroed) incoming gradient; guarding the sim inputs
    zeroes exactly those entries so one bad env cannot NaN the whole
    batch's parameter gradient.
    """
    return x


def _gng_fwd(x):
    return x, None


def _gng_bwd(_, g):
    return (jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),)


grad_nan_guard.defvjp(_gng_fwd, _gng_bwd)


@_pytree_dataclass
@dataclass(frozen=True)
class EnvState:
    """Batched env state [E, ...]; a pure pytree carried through scans."""

    joint_q: jnp.ndarray      # [E, C]
    joint_qd: jnp.ndarray     # [E, D]
    actions: jnp.ndarray      # [E, A] last applied actions
    progress: jnp.ndarray     # [E] int32
    key: jnp.ndarray          # PRNG key


class DiffEnv:
    """Base class for differentiable environments.

    Subclasses build ``self.model`` (single-robot template) and implement the
    pure hooks; all public methods are jit-compatible pure functions of
    (EnvState, actions).
    """

    num_obs: int = 0
    num_acts: int = 0

    # sim parameters (overridden per env)
    dt = 1.0 / 60.0
    sim_substeps = 16
    mm_caching_frequency = 1

    def __init__(
        self,
        num_envs: int = 64,
        seed: int = 0,
        episode_length: int = 1000,
        stochastic_init: bool = False,
        MM_caching_frequency: int = 1,
        early_termination: bool = True,
        no_grad: bool = False,  # accepted for API parity; unused (grad is free)
        render: bool = False,
        device=None,
        remat_granularity: int = 1,
        sim_backward: Optional[str] = None,
    ):
        self.num_envs = num_envs
        self.seed = seed
        self.episode_length = episode_length
        self.stochastic_init = stochastic_init
        self.mm_caching_frequency = MM_caching_frequency
        self.early_termination = early_termination
        self.visualize = render
        self.remat_granularity = remat_granularity
        # "lb" = link-batched env-minor substeps with a hand-written reverse
        # scan (sim/articulation_lb.py); "remat" = autodiff through scan +
        # per-substep jax.checkpoint; "manual" = hand-written reverse pass
        # over unrolled per-env substeps (sim/articulation.py
        # _simulate_manual). None defers to the library default ("auto":
        # pick "lb" when the model qualifies, else "remat").
        from .. import config as _config
        self.sim_backward = (
            sim_backward if sim_backward is not None
            else _config.default_sim_backward
        )

        self.model: Model = self.build_model()

        if self.sim_backward == "auto":
            lb_ok = (
                self.model.particle_count == 0
                and self.model.link_count > 0
                and self.sim_substeps % max(self.mm_caching_frequency, 1) == 0
            )
            self.sim_backward = "lb" if lb_ok else "remat"

    # -- per-env hooks -------------------------------------------------------

    def build_model(self) -> Model:
        raise NotImplementedError

    def action_to_controls(self, actions) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Map clipped actions [A] -> (joint_act [D] | None, muscle_act [M] | None).
        Single-env; vmapped by step()."""
        raise NotImplementedError

    def observations(self, joint_q, joint_qd, actions) -> jnp.ndarray:
        """Single-env observation vector."""
        raise NotImplementedError

    def reward(self, obs, actions) -> jnp.ndarray:
        """Single-env scalar reward."""
        raise NotImplementedError

    def termination(self, obs) -> jnp.ndarray:
        """Single-env early-termination flag (bool). Default: never."""
        return jnp.asarray(False)

    def initial_state(self, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Single-env (joint_q, joint_qd) start state; `key` used when
        stochastic_init."""
        raise NotImplementedError

    def invalid_mask(self, obs, joint_q, joint_qd) -> jnp.ndarray:
        """NaN/inf/blow-up defense mask (humanoid/snu envs); default none."""
        return jnp.asarray(False)

    def zero_reward_on_invalid(self) -> bool:
        return False

    # -- public API ----------------------------------------------------------

    def batch_observations(self, env_state: EnvState) -> jnp.ndarray:
        return jax.vmap(self.observations)(
            env_state.joint_q, env_state.joint_qd, env_state.actions
        )

    def reset(self, key) -> EnvState:
        """Fresh EnvState with all envs at (possibly stochastic) start state."""
        key, sub = jax.random.split(jax.random.PRNGKey(self.seed) if key is None else key)
        keys = jax.random.split(sub, self.num_envs)
        q, qd = jax.vmap(self.initial_state)(keys)
        return EnvState(
            joint_q=q,
            joint_qd=qd,
            actions=jnp.zeros((self.num_envs, self.num_acts), dtype=jnp.float32),
            progress=jnp.zeros((self.num_envs,), dtype=jnp.int32),
            key=key,
        )

    def step(
        self, env_state: EnvState, actions
    ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
        """One env step for the whole batch. Pure; jit/scan/grad-compatible.

        Returns (next_state, obs, reward, done, info) with the reference's
        ordering semantics: reward/done from the pre-reset state, returned obs
        from the post-reset state, pre-reset obs in info['obs_before_reset']
        (envs/ant.py:156-225).
        """
        actions = jnp.clip(
            actions.reshape(self.num_envs, self.num_acts), -1.0, 1.0
        )

        joint_act, muscle_act = jax.vmap(self.action_to_controls)(actions)

        def sim_one(q, qd, ja, ma):
            s = simulate(
                self.model,
                State(joint_q=q, joint_qd=qd),
                joint_act=ja,
                muscle_act=ma,
                dt=self.dt,
                substeps=self.sim_substeps,
                mass_matrix_freq=self.mm_caching_frequency,
                remat_granularity=self.remat_granularity,
                backward=self.sim_backward,
            )
            return s.joint_q, s.joint_qd

        with jax.named_scope("env_sim"):
            # per-entry gradient firewall on the sim inputs (see
            # grad_nan_guard): inert unless an env's backward NaNs
            sim_in = jax.tree.map(
                grad_nan_guard,
                (env_state.joint_q, env_state.joint_qd, joint_act, muscle_act),
            )
            if self.sim_backward == "pallas":
                # batch-level path: the whole substep chain (and its VJP)
                # runs as one fused Pallas kernel per env tile instead of
                # vmapped per-env XLA graphs (sim/pallas_substep.py)
                from ..sim.articulation import simulate_batched_pallas

                q, qd = simulate_batched_pallas(
                    self.model, *sim_in,
                    dt=self.dt,
                    substeps=self.sim_substeps,
                    mass_matrix_freq=self.mm_caching_frequency,
                )
            elif self.sim_backward in ("lb", "lb_ad"):
                # batch-level link-batched env-minor path: ~10x fewer XLA
                # fusions per substep VJP on the launch-bound reverse pass
                # (sim/articulation_lb.py). "lb" replays substeps in the
                # hand-written reverse scan; "lb_ad" lets XLA save residuals
                # instead (more HBM, no recompute pass).
                from ..sim.articulation_lb import simulate_batched_lb

                q, qd = simulate_batched_lb(
                    self.model, *sim_in,
                    dt=self.dt,
                    substeps=self.sim_substeps,
                    mass_matrix_freq=self.mm_caching_frequency,
                    reverse="residual" if self.sim_backward == "lb_ad"
                    else "replay",
                )
            else:
                q, qd = jax.vmap(sim_one)(*sim_in)

        progress = env_state.progress + 1

        with jax.named_scope("env_obs_reward"):
            # Observations are computed from SANITIZED state: for finite
            # values nan_to_num is the identity with identity Jacobian, but
            # for a blown-up env it stops NaN primals from reaching the
            # obs/reward graph — a `where(done, safe, obs)` only masks the
            # primal, while its VJP still multiplies the (zero) cotangent
            # by Jacobians evaluated at the NaN primal (0 * NaN = NaN),
            # poisoning the whole batch's gradient. Invalidity is still
            # detected from the RAW state below.
            q_obs = jnp.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)
            qd_obs = jnp.nan_to_num(qd, nan=0.0, posinf=0.0, neginf=0.0)
            obs = jax.vmap(self.observations)(q_obs, qd_obs, actions)
            rew = jax.vmap(self.reward)(obs, actions)

            done = progress > self.episode_length - 1
            term = jax.vmap(self.termination)(obs)
            if self.early_termination:
                done = done | term
            invalid = jax.vmap(self.invalid_mask)(obs, q, qd)
            done = done | invalid
            rew = jnp.where(jnp.isfinite(rew), rew, 0.0)
            if self.zero_reward_on_invalid():
                rew = jnp.where(invalid, 0.0, rew)

        with jax.named_scope("env_reset"):
            # in-graph partial reset: fresh values carry no gradient to the past
            key, sub = jax.random.split(env_state.key)
            reset_keys = jax.random.split(sub, self.num_envs)
            q0, qd0 = jax.vmap(self.initial_state)(reset_keys)
            q0, qd0 = lax.stop_gradient((q0, qd0))

            d = done[:, None]
            # sanitize sim output on the reset branch so NaNs cannot leak
            # through the unselected side of where() into gradients
            q_safe = jnp.where(d, jnp.nan_to_num(q, 0.0, 0.0, 0.0), q)
            qd_safe = jnp.where(d, jnp.nan_to_num(qd, 0.0, 0.0, 0.0), qd)
            q_new = jnp.where(d, q0, q_safe)
            qd_new = jnp.where(d, qd0, qd_safe)
            actions_new = jnp.where(d, 0.0, actions)
            progress_new = jnp.where(done, 0, progress)

            obs_reset = jax.vmap(self.observations)(q_new, qd_new, actions_new)
            obs_out = jnp.where(d, obs_reset, obs)

        new_state = EnvState(
            joint_q=q_new,
            joint_qd=qd_new,
            actions=actions_new,
            progress=progress_new,
            key=key,
        )
        info = {
            "obs_before_reset": obs,
            "episode_end": term | invalid,
            "invalid": invalid,
            # time-limit done (as opposed to early termination) — SHAC's
            # bootstrap keeps the critic value only for truncated episodes
            "truncation": progress > self.episode_length - 1,
        }
        return new_state, obs_out, rew, done, info

    # -- gradient-window helpers (SHAC/BPTT semantics) ------------------------

    def initialize_trajectory(self, env_state: EnvState):
        """Cut the graph to previous windows and return current observations
        (envs/ant.py:251-255). The returned state is detached."""
        detached = lax.stop_gradient(env_state)
        return detached, self.batch_observations(detached)
