"""Actor/critic networks as pure-pytree MLPs.

Architecture parity with the reference (/root/reference/models/actor.py,
critic.py): Linear stacks with ELU + LayerNorm on hidden layers, orthogonal
init (gain sqrt(2)) with zero bias, and for the stochastic actor a
state-independent learnable logstd (actor.py:71-73). Pure functions + param
pytrees (init/apply) instead of nn.Module state — jit/grad/vmap-native and
trivially checkpointable.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp


def _orthogonal(key, shape, gain):
    # torch.nn.init.orthogonal_ semantics
    rows, cols = shape
    flat = jax.random.normal(key, (max(rows, cols), min(rows, cols)))
    q, r = jnp.linalg.qr(flat)
    q = q * jnp.sign(jnp.diag(r))
    q = q[:rows, :cols] if rows >= cols else q[:cols, :rows].T
    return gain * q


_ACTIVATIONS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def init_mlp(key, layer_dims: Sequence[int], gain: float = math.sqrt(2.0)):
    params = []
    keys = jax.random.split(key, len(layer_dims) - 1)
    for i, k in enumerate(keys):
        w = _orthogonal(k, (layer_dims[i + 1], layer_dims[i]), gain).astype(jnp.float32)
        b = jnp.zeros((layer_dims[i + 1],), dtype=jnp.float32)
        layer = {"w": w, "b": b}
        if i < len(layer_dims) - 2:
            layer["ln_scale"] = jnp.ones((layer_dims[i + 1],), dtype=jnp.float32)
            layer["ln_bias"] = jnp.zeros((layer_dims[i + 1],), dtype=jnp.float32)
        params.append(layer)
    return params


def apply_mlp(params: List[Dict[str, Any]], x, activation: str = "elu"):
    act = _ACTIVATIONS[activation]
    for i, layer in enumerate(params):
        x = x @ layer["w"].T + layer["b"]
        if "ln_scale" in layer:
            x = act(x)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            x = x * layer["ln_scale"] + layer["ln_bias"]
    return x


class ActorStochasticMLP:
    """Gaussian policy: mu MLP + learnable state-independent logstd."""

    def __init__(self, obs_dim, action_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        units = cfg_network.get("actor_mlp", {}).get("units", [64, 64])
        self.activation = cfg_network.get("actor_mlp", {}).get("activation", "elu")
        self.layer_dims = [obs_dim] + list(units) + [action_dim]
        self.logstd_init = cfg_network.get("actor_logstd_init", -1.0)
        self.action_dim = action_dim
        self.obs_dim = obs_dim

    def init(self, key):
        return {
            "mlp": init_mlp(key, self.layer_dims),
            "logstd": jnp.full((self.action_dim,), self.logstd_init, dtype=jnp.float32),
        }

    def mu(self, params, obs):
        return apply_mlp(params["mlp"], obs, self.activation)

    def __call__(self, params, obs, key=None, deterministic=False):
        mu = self.mu(params, obs)
        if deterministic or key is None:
            return mu
        std = jnp.exp(params["logstd"])
        eps = jax.random.normal(key, mu.shape)
        return mu + eps * std  # reparameterized sample (actor.py:93-95)

    def dist(self, params, obs):
        mu = self.mu(params, obs)
        std = jnp.broadcast_to(jnp.exp(params["logstd"]), mu.shape)
        return mu, std

    def log_prob(self, params, obs, actions):
        mu, std = self.dist(params, obs)
        var = std ** 2
        return -0.5 * (
            (actions - mu) ** 2 / var + 2.0 * jnp.log(std) + math.log(2.0 * math.pi)
        )


class ActorDeterministicMLP:
    def __init__(self, obs_dim, action_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        units = cfg_network.get("actor_mlp", {}).get("units", [64, 64])
        self.activation = cfg_network.get("actor_mlp", {}).get("activation", "elu")
        self.layer_dims = [obs_dim] + list(units) + [action_dim]
        self.action_dim = action_dim
        self.obs_dim = obs_dim

    def init(self, key):
        return {"mlp": init_mlp(key, self.layer_dims)}

    def __call__(self, params, obs, key=None, deterministic=True):
        return apply_mlp(params["mlp"], obs, self.activation)


class CriticMLP:
    def __init__(self, obs_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        units = cfg_network.get("critic_mlp", {}).get("units", [64, 64])
        self.activation = cfg_network.get("critic_mlp", {}).get("activation", "elu")
        self.layer_dims = [obs_dim] + list(units) + [1]

    def init(self, key):
        return {"mlp": init_mlp(key, self.layer_dims)}

    def __call__(self, params, obs):
        return apply_mlp(params["mlp"], obs, self.activation)


class DoubleCriticMLP:
    """Twin Q-networks for SAC (obs+action input)."""

    def __init__(self, obs_dim, action_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        units = cfg_network.get("critic_mlp", {}).get("units", [256, 256])
        self.activation = cfg_network.get("critic_mlp", {}).get("activation", "elu")
        self.layer_dims = [obs_dim + action_dim] + list(units) + [1]

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "q1": init_mlp(k1, self.layer_dims),
            "q2": init_mlp(k2, self.layer_dims),
        }

    def __call__(self, params, obs, actions):
        x = jnp.concatenate([obs, actions], axis=-1)
        q1 = apply_mlp(params["q1"], x, self.activation)
        q2 = apply_mlp(params["q2"], x, self.activation)
        return q1, q2
