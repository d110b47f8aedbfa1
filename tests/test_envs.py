"""Environment smoke tests (reference: examples/test_env.py pattern —
random actions, finiteness, reset behavior).

Humanoid/SNUHumanoid compile for minutes on the CPU test backend (22+ link
unrolled dynamics x XLA CPU): they run only when DIFFRL_SLOW_TESTS=1
(validated on hardware separately)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffrl_tpu.envs as envs

FAST_ENVS = [
    ("CartPoleSwingUp", 4),
    ("Ant", 16),
    ("Hopper", 16),
    ("Cheetah", 16),
]
SLOW_ENVS = [("Humanoid", 48), ("SNUHumanoid", 8)]

slow = pytest.mark.skipif(
    not os.environ.get("DIFFRL_SLOW_TESTS"),
    reason="set DIFFRL_SLOW_TESTS=1 (multi-minute CPU compiles)",
)


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


@slow
@pytest.mark.parametrize("name,mm", SLOW_ENVS)
def test_env_smoke_slow(name, mm):
    _run_env(name, mm, steps=5, num_envs=2, episode_length=4)


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
