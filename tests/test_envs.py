"""Environment smoke tests (reference: examples/test_env.py pattern —
random actions, finiteness, reset behavior).

The full Humanoid/SNUHumanoid topologies compile for tens of minutes on the
CPU test backend (22+ link unrolled dynamics x XLA CPU), so the default
suite exercises those env CLASSES through reduced-topology subclasses
(TinyHumanoidEnv / TinySNUEnv below — same observation/reward/termination/
muscle code, 3-4 links); the full-size variants run when DIFFRL_SLOW_TESTS=1
and are validated at scale on hardware (docs/VALIDATION.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffrl_tpu.envs as envs
from diffrl_tpu.envs.humanoid import HumanoidEnv
from diffrl_tpu.envs.snu_humanoid import SNUHumanoidEnv

FAST_ENVS = [
    ("CartPoleSwingUp", 4),
    ("Ant", 16),
    ("Hopper", 16),
    ("Cheetah", 16),
]
# full-size variants are collected only when opted in — the standard run
# has zero skips, and the same code paths are covered by the tiny variants
# below
SLOW_ENVS = [("Humanoid", 48), ("SNUHumanoid", 8)]

_TEST_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class TinyHumanoidEnv(HumanoidEnv):
    """CI-sized humanoid: free root + 3 hinges, same env code paths."""

    asset_file = os.path.join(_TEST_ASSETS, "tiny_humanoid.xml")
    motor_strength_list = (200, 200, 100)
    sim_substeps = 8
    start_height = 1.0
    termination_height = 0.4


class TinySNUEnv(SNUHumanoidEnv):
    """CI-sized SNU biomech model: pelvis + right leg, muscles included."""

    body_filter = {"Pelvis", "FemurR", "TibiaR"}
    sim_substeps = 8
    termination_height = 0.3


def _run_env(name, mm, steps=25, num_envs=4, episode_length=20):
    env = envs.make(name, num_envs=num_envs, seed=0, stochastic_init=True,
                    episode_length=episode_length, MM_caching_frequency=mm)
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (env.num_envs, env.num_acts),
                                   minval=-1.0, maxval=1.0)
            s, obs, rew, done, _ = env.step(s, a)
            return (s, k), (obs, rew, done)
        (state, _), (obs, rew, done) = jax.lax.scan(
            body, (state, jax.random.PRNGKey(1)), None, length=steps
        )
        return state, obs, rew, done

    state, obs, rew, done = rollout(state, jax.random.PRNGKey(1))
    assert obs.shape == (steps, num_envs, env.num_obs)
    assert bool(jnp.all(jnp.isfinite(obs))), f"{name}: non-finite obs"
    assert bool(jnp.all(jnp.isfinite(rew))), f"{name}: non-finite reward"
    # episode_length < steps: every env must have reset at least once
    assert bool(jnp.any(done)), f"{name}: no env ever finished"
    # progress counters reset on done
    assert int(jnp.max(state.progress)) <= episode_length
    return env, obs


@pytest.mark.parametrize("name,mm", FAST_ENVS)
def test_env_smoke(name, mm):
    _run_env(name, mm)


if os.environ.get("DIFFRL_SLOW_TESTS"):

    @pytest.mark.parametrize("name,mm", SLOW_ENVS)
    def test_env_smoke_slow(name, mm):
        _run_env(name, mm, steps=5, num_envs=2, episode_length=4)


@pytest.mark.parametrize("cls,mm", [(TinyHumanoidEnv, 4), (TinySNUEnv, 4)])
def test_env_smoke_tiny_variants(cls, mm):
    """Humanoid/SNU env classes stepped end-to-end on reduced topologies:
    covers their obs/reward/termination/invalid-state/muscle wiring in the
    default suite (the full robots need multi-minute CPU compiles)."""
    env = cls(num_envs=2, seed=0, stochastic_init=True, episode_length=4,
              MM_caching_frequency=mm)
    if isinstance(env, TinySNUEnv):
        assert env.model.topology.muscle_count > 0, "no muscles survived filter"
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (env.num_envs, env.num_acts),
                                   minval=-1.0, maxval=1.0)
            s, obs, rew, done, _ = env.step(s, a)
            return (s, k), (obs, rew, done)
        (state, _), (obs, rew, done) = jax.lax.scan(
            body, (state, jax.random.PRNGKey(1)), None, length=5)
        return state, obs, rew, done

    state, obs, rew, done = rollout(state, jax.random.PRNGKey(1))
    assert obs.shape == (5, 2, env.num_obs)
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(rew)))
    assert bool(jnp.any(done))  # episode_length 4 < 5 steps

    # gradients flow through the muscle/torque path
    def loss(actions):
        s2, _, r, _, _ = env.step(state, actions)
        return jnp.sum(r) + jnp.sum(s2.joint_qd ** 2)

    g = jax.grad(loss)(jnp.zeros((2, env.num_acts)))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_obs_dims_match_reference():
    """obs/act dims per env match the reference table (SURVEY.md §2.5)."""
    dims = {
        "CartPoleSwingUp": (5, 1),
        "Ant": (37, 8),
        "Hopper": (11, 3),
        "Cheetah": (17, 6),
        "Humanoid": (76, 21),
    }
    for name, (num_obs, num_acts) in dims.items():
        cls = envs._REGISTRY[name]
        assert cls.num_obs == num_obs, (name, cls.num_obs)
        assert cls.num_acts == num_acts, (name, cls.num_acts)
    # SNU sets dims at construction: 53 obs / 152 muscle activations in MTU
    # mode (envs/snu_humanoid.py:30-188 in the reference)
    snu = envs.make("SNUHumanoid", num_envs=1)
    assert (snu.num_obs, snu.num_acts) == (53, 152)


def test_stochastic_init_varies_and_reset_stops_gradient():
    env = envs.make("Ant", num_envs=8, seed=0, stochastic_init=True)
    s1 = env.reset(jax.random.PRNGKey(0))
    q = np.asarray(s1.joint_q)
    # different envs get different stochastic starts
    assert np.std(q[:, 7:]) > 1e-3


def test_stateful_wrapper_reference_api():
    """StatefulEnv mirrors the reference DFlexEnv call surface."""
    from diffrl_tpu.envs import StatefulEnv

    env = StatefulEnv(envs.make("CartPoleSwingUp", num_envs=4, episode_length=8))
    obs = env.reset()
    assert obs.shape == (4, env.num_obs)
    for _ in range(10):
        a = jnp.zeros((4, env.num_actions))
        obs, rew, done, info = env.step(a)
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert "obs_before_reset" in info
    obs2 = env.initialize_trajectory()
    assert obs2.shape == obs.shape
    ckpt = env.get_checkpoint()
    env.step(jnp.ones((4, env.num_actions)))
    env.load_checkpoint(ckpt)
    obs3 = env.env.batch_observations(env.state)
    np.testing.assert_allclose(np.asarray(obs2), np.asarray(obs3))


def test_invalid_state_zeroes_reward_and_resets():
    """A non-finite sim state must produce zero reward + forced reset for
    envs with blow-up defenses (Humanoid/SNU), not a NaN that poisons the
    episode trackers (regression: 2000-epoch humanoid run NaN'd at ~460)."""
    import dataclasses as dc

    import jax.numpy as jnp

    env = envs.make("CartPoleSwingUp", num_envs=2, episode_length=100)
    # defense flags are class-level behavior; simulate them via the Humanoid
    # overrides directly
    from diffrl_tpu.envs.humanoid import HumanoidEnv

    assert HumanoidEnv.zero_reward_on_invalid(object()) is True

    # and the base mechanism: poison one env's state, step, check outputs
    env.zero_reward_on_invalid = lambda: True
    env.invalid_mask = lambda obs, q, qd: ~jnp.all(jnp.isfinite(q))
    es = env.reset(jax.random.PRNGKey(0))
    bad_q = es.joint_q.at[0].set(jnp.nan)
    es = dc.replace(es, joint_q=bad_q)
    es2, obs, rew, done, info = env.step(
        es, jnp.zeros((2, env.num_acts))
    )
    assert bool(done[0]) and float(rew[0]) == 0.0
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(es2.joint_q)))

    # the GRADIENT must also stay finite: a where() only masks the primal,
    # so obs/reward must be computed from sanitized state or the NaN
    # Jacobians poison the cotangents (0 * NaN = NaN)
    def loss(actions):
        _, _, r, _, _ = env.step(es, actions)
        return jnp.sum(r)

    g = jax.grad(loss)(jnp.zeros((2, env.num_acts)))
    assert bool(jnp.all(jnp.isfinite(g))), g
