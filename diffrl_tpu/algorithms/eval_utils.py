"""Device-side batched policy evaluation shared by the trainers.

The reference's players step the env once per Python iteration
(rl_games players.py / shac.py evaluate loop); over a tunneled device
every step pays a host->device dispatch RTT. Here whole chunks of steps
run inside one jitted scan with episode statistics reduced on device:
one dispatch + one small sync per chunk.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def batched_eval(env, act_fn, key, num_games, gamma=1.0, chunk=None):
    """Evaluate a policy on a vectorized env until `num_games` episodes end.

    act_fn(obs, key) -> actions (policy-specific; closure carries params).
    Returns (mean_episode_reward, mean_discounted_reward, mean_length).
    """
    chunk = chunk or min(env.episode_length, 256)
    env_state = env.reset(key)
    obs = env.batch_observations(env_state)

    @jax.jit
    def eval_chunk(env_state, obs, trk, key):
        def body(carry, _):
            env_state, obs, trk, key = carry
            key, k = jax.random.split(key)
            actions = act_fn(obs, k)
            env_state, obs, rew, done, _ = env.step(env_state, actions)

            ep_rew = trk["ep_rew"] + rew
            ep_disc = trk["ep_disc"] + trk["ep_gamma"] * rew
            ep_len = trk["ep_len"] + 1
            out = dict(
                sum_rew=jnp.sum(jnp.where(done, ep_rew, 0.0)),
                sum_disc=jnp.sum(jnp.where(done, ep_disc, 0.0)),
                sum_len=jnp.sum(jnp.where(done, ep_len, 0)),
                games=jnp.sum(done),
            )
            trk = dict(
                ep_rew=jnp.where(done, 0.0, ep_rew),
                ep_disc=jnp.where(done, 0.0, ep_disc),
                ep_gamma=jnp.where(done, 1.0, trk["ep_gamma"] * gamma),
                ep_len=jnp.where(done, 0, ep_len),
            )
            return (env_state, obs, trk, key), out

        (env_state, obs, trk, key), outs = lax.scan(
            body, (env_state, obs, trk, key), None, length=chunk
        )
        return env_state, obs, trk, key, jax.tree.map(jnp.sum, outs)

    trk = dict(
        ep_rew=jnp.zeros(env.num_envs),
        ep_disc=jnp.zeros(env.num_envs),
        ep_gamma=jnp.ones(env.num_envs),
        ep_len=jnp.zeros(env.num_envs, dtype=jnp.int32),
    )
    tot = dict(sum_rew=0.0, sum_disc=0.0, sum_len=0.0, games=0.0)
    while tot["games"] < num_games:
        env_state, obs, trk, key, sums = eval_chunk(env_state, obs, trk, key)
        sums = jax.device_get(sums)  # ONE host sync per chunk
        for k2 in tot:
            tot[k2] += float(sums[k2])
    g = tot["games"]
    return tot["sum_rew"] / g, tot["sum_disc"] / g, tot["sum_len"] / g
