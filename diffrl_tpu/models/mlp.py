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


def init_mlp(key, layer_dims: Sequence[int], gain: float = math.sqrt(2.0),
             layer_norm: bool = True):
    params = []
    keys = jax.random.split(key, len(layer_dims) - 1)
    for i, k in enumerate(keys):
        w = _orthogonal(k, (layer_dims[i + 1], layer_dims[i]), gain).astype(jnp.float32)
        b = jnp.zeros((layer_dims[i + 1],), dtype=jnp.float32)
        layer = {"w": w, "b": b}
        if layer_norm and i < len(layer_dims) - 2:
            layer["ln_scale"] = jnp.ones((layer_dims[i + 1],), dtype=jnp.float32)
            layer["ln_bias"] = jnp.zeros((layer_dims[i + 1],), dtype=jnp.float32)
        params.append(layer)
    return params


def apply_mlp(params: List[Dict[str, Any]], x, activation: str = "elu"):
    act = _ACTIVATIONS[activation]
    last = len(params) - 1
    for i, layer in enumerate(params):
        x = x @ layer["w"].T + layer["b"]
        if "ln_scale" in layer:
            x = act(x)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            x = x * layer["ln_scale"] + layer["ln_bias"]
        elif i < last:
            x = act(x)
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


class ActorCriticPPO:
    """Shared-trunk actor-critic for PPO, rl_games 'continuous_a2c_logstd'
    parity (/root/reference/externals/rl_games/rl_games/algos_torch/
    network_builder.py MLP path): plain MLP (no LayerNorm), mu + value heads
    off the trunk, state-independent logstd initialized to sigma_init val
    (cfg/ppo/ant.yaml: const 0, fixed_sigma=True)."""

    def __init__(self, obs_dim, action_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        mlp_cfg = cfg_network.get("mlp", {})
        units = list(mlp_cfg.get("units", [128, 64, 32]))
        self.activation = mlp_cfg.get("activation", "elu")
        self.trunk_dims = [obs_dim] + units
        self.hidden = units[-1]
        self.action_dim = action_dim
        sigma_init = (
            cfg_network.get("space", {})
            .get("continuous", {})
            .get("sigma_init", {})
            .get("val", 0.0)
        )
        self.sigma_init = float(sigma_init or 0.0)

    def init(self, key):
        kt, km, kv = jax.random.split(key, 3)
        trunk = init_mlp(kt, self.trunk_dims, layer_norm=False)
        mu = init_mlp(km, [self.hidden, self.action_dim], gain=0.01, layer_norm=False)
        value = init_mlp(kv, [self.hidden, 1], gain=1.0, layer_norm=False)
        return {
            "trunk": trunk,
            "mu": mu,
            "value": value,
            "logstd": jnp.full((self.action_dim,), self.sigma_init, dtype=jnp.float32),
        }

    def __call__(self, params, obs):
        act = _ACTIVATIONS[self.activation]
        h = obs
        for layer in params["trunk"]:
            h = act(h @ layer["w"].T + layer["b"])
        mu = apply_mlp(params["mu"], h)
        value = apply_mlp(params["value"], h)[..., 0]
        sigma = jnp.broadcast_to(jnp.exp(params["logstd"]), mu.shape)
        return mu, sigma, value

    def log_prob(self, mu, sigma, actions):
        return jnp.sum(
            -0.5 * ((actions - mu) / sigma) ** 2
            - jnp.log(sigma)
            - 0.5 * math.log(2.0 * math.pi),
            axis=-1,
        )

    def entropy(self, sigma):
        return jnp.sum(jnp.log(sigma) + 0.5 * math.log(2.0 * math.pi * math.e), axis=-1)


class SACActor:
    """Squashed-Gaussian policy with state-dependent log_std head,
    rl_games SAC parity (/root/reference/externals/rl_games/rl_games/
    algos_torch/sac_helper.py SquashedNormal + network_builder log_std
    bounds): log_std soft-clamped into log_std_bounds, tanh squashing with
    log-det-Jacobian correction."""

    def __init__(self, obs_dim, action_dim, cfg_network=None):
        cfg_network = cfg_network or {}
        mlp_cfg = cfg_network.get("mlp", {})
        units = list(mlp_cfg.get("units", [256, 128, 64]))
        self.activation = mlp_cfg.get("activation", "relu")
        self.layer_dims = [obs_dim] + units + [2 * action_dim]
        self.action_dim = action_dim
        lo, hi = cfg_network.get("log_std_bounds", [-5.0, 2.0])
        self.log_std_min, self.log_std_max = float(lo), float(hi)

    def init(self, key):
        return {"mlp": init_mlp(key, self.layer_dims, layer_norm=False)}

    def dist(self, params, obs):
        out = apply_mlp(params["mlp"], obs, self.activation)
        mu, log_std = jnp.split(out, 2, axis=-1)
        # soft bound (rl_games network_builder.py: tanh rescale into range)
        t = jnp.tanh(log_std)
        log_std = self.log_std_min + 0.5 * (self.log_std_max - self.log_std_min) * (t + 1.0)
        return mu, jnp.exp(log_std)

    def sample(self, params, obs, key):
        """Returns (action in [-1,1], log_prob)."""
        mu, std = self.dist(params, obs)
        eps = jax.random.normal(key, mu.shape)
        pre_tanh = mu + eps * std
        action = jnp.tanh(pre_tanh)
        log_prob = jnp.sum(
            -0.5 * eps ** 2 - jnp.log(std) - 0.5 * math.log(2.0 * math.pi)
            - jnp.log(jnp.maximum(1.0 - action ** 2, 1e-6)),
            axis=-1,
        )
        return action, log_prob

    def mean_action(self, params, obs):
        mu, _ = self.dist(params, obs)
        return jnp.tanh(mu)
