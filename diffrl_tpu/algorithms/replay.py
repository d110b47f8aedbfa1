"""Replay buffers: uniform and proportional-prioritized (device-resident).

TPU-native equivalent of rl_games' replay machinery
(/root/reference/externals/rl_games/rl_games/common/experience.py
ReplayBuffer/PrioritizedReplayBuffer + common/segment_tree.py): instead of
a host-side segment tree walked pointer-by-pointer, priorities live in a
dense device array; sampling computes the prefix-sum CDF with one
``jnp.cumsum`` and inverts it with a batched ``searchsorted`` — fully
vectorized, jit/scan-compatible, O(capacity) streaming bandwidth per
sample call instead of O(B log N) scalar hops.

The buffer itself is a pytree dict (storage arrays + idx/count [+ prio]),
so it threads through jitted training scans like any other carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def make_buffer(capacity, obs_dim, act_dim, prioritized=False):
    buf = dict(
        obs=jnp.zeros((capacity, obs_dim), dtype=jnp.float32),
        actions=jnp.zeros((capacity, act_dim), dtype=jnp.float32),
        rews=jnp.zeros((capacity,), dtype=jnp.float32),
        next_obs=jnp.zeros((capacity, obs_dim), dtype=jnp.float32),
        dones=jnp.zeros((capacity,), dtype=jnp.float32),
        idx=jnp.asarray(0, dtype=jnp.int32),
        count=jnp.asarray(0, dtype=jnp.int32),
    )
    if prioritized:
        buf["prio"] = jnp.zeros((capacity,), dtype=jnp.float32)
        buf["max_prio"] = jnp.asarray(1.0, dtype=jnp.float32)
    return buf


def add(buf, obs, actions, rews, next_obs, dones):
    """Insert a contiguous batch of E transitions at the ring cursor."""
    i = buf["idx"]
    E = obs.shape[0]
    cap = buf["obs"].shape[0]
    out = dict(
        buf,
        obs=lax.dynamic_update_slice(buf["obs"], obs, (i, 0)),
        actions=lax.dynamic_update_slice(buf["actions"], actions, (i, 0)),
        rews=lax.dynamic_update_slice(buf["rews"], rews, (i,)),
        next_obs=lax.dynamic_update_slice(buf["next_obs"], next_obs, (i, 0)),
        dones=lax.dynamic_update_slice(buf["dones"], dones, (i,)),
        idx=(i + E) % cap,
        count=jnp.minimum(buf["count"] + E, cap),
    )
    if "prio" in buf:
        # fresh samples get max priority (experience.py add semantics)
        out["prio"] = lax.dynamic_update_slice(
            buf["prio"], jnp.full((E,), buf["max_prio"]), (i,)
        )
    return out


def sample_uniform(buf, key, batch_size):
    n = jnp.maximum(buf["count"], 1)
    idx = jax.random.randint(key, (batch_size,), 0, n)
    return idx, _gather(buf, idx), jnp.ones((batch_size,))


def sample_prioritized(buf, key, batch_size, alpha=0.6, beta=0.4):
    """Proportional prioritization: P(i) = p_i^alpha / sum, IS weights
    (N P(i))^-beta normalized by the max weight."""
    cap = buf["prio"].shape[0]
    n = jnp.maximum(buf["count"], 1)
    valid = jnp.arange(cap) < n
    p = jnp.where(valid, buf["prio"], 0.0) ** alpha
    p = jnp.where(valid, jnp.maximum(p, 1e-12), 0.0)
    cdf = jnp.cumsum(p)
    total = cdf[-1]
    u = jax.random.uniform(key, (batch_size,), minval=0.0, maxval=total)
    idx = jnp.clip(jnp.searchsorted(cdf, u), 0, n - 1)

    probs = p[idx] / total
    w = (n.astype(jnp.float32) * probs) ** (-beta)
    w = w / jnp.maximum(jnp.max(w), 1e-12)
    return idx, _gather(buf, idx), w


def update_priorities(buf, idx, td_errors, eps=1e-6):
    prio = jnp.abs(td_errors) + eps
    return dict(
        buf,
        prio=buf["prio"].at[idx].set(prio),
        max_prio=jnp.maximum(buf["max_prio"], jnp.max(prio)),
    )


def _gather(buf, idx):
    return (
        buf["obs"][idx], buf["actions"][idx], buf["rews"][idx],
        buf["next_obs"][idx], buf["dones"][idx],
    )
