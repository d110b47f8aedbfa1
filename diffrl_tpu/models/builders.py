"""Config-driven network construction: CNN / RNN / discrete heads.

TPU-native counterpart of rl_games' A2CBuilder network family
(/root/reference/externals/rl_games/rl_games/algos_torch/network_builder.py):
the reference builds nn.Modules from the YAML ``network`` tree (cnn convs,
mlp units, rnn before/after mlp, and a continuous / discrete /
multi_discrete action space); here the same YAML tree produces a pure
init/apply pytree network usable under jit/grad/vmap.

Supported config surface (matching network_builder.py:load / _build_conv /
_build_rnn / the space heads):

.. code-block:: yaml

    network:
      name: actor_critic
      separate: False            # shared or separate actor/critic trunks
      space:
        continuous: {fixed_sigma: True, sigma_init: {val: 0}}
        # or: discrete: {}      # categorical logits head
        # or: multi_discrete: {} with action_dims = [n1, n2, ...]
      cnn:
        type: conv2d
        activation: relu
        convs:
          - {filters: 32, kernel_size: 8, strides: 4}
          - {filters: 64, kernel_size: 4, strides: 2}
      mlp: {units: [256, 128], activation: elu}
      rnn: {name: lstm, units: 256, layers: 1, before_mlp: False}

Everything is float32; conv layouts are NHWC (TPU-friendly: channel minor
maps to the 128-lane dimension).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .mlp import _ACTIVATIONS, _orthogonal, apply_mlp, init_mlp

# ---------------------------------------------------------------------------
# conv trunk (network_builder.py:_build_conv, conv2d path)
# ---------------------------------------------------------------------------


def init_conv(key, in_channels: int, convs: Sequence[Dict[str, int]]):
    """Conv stack params. Each spec: filters / kernel_size / strides."""
    params = []
    keys = jax.random.split(key, max(1, len(convs)))
    c_in = in_channels
    for spec, k in zip(convs, keys):
        c_out = int(spec["filters"])
        ks = int(spec["kernel_size"])
        # orthogonal over the flattened receptive field, sqrt(2) gain — same
        # default initializer family as the MLP layers
        w = _orthogonal(k, (c_out, ks * ks * c_in), math.sqrt(2.0))
        w = w.reshape(c_out, ks, ks, c_in).transpose(1, 2, 3, 0)  # HWIO
        params.append({
            "w": w.astype(jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32),
        })
        c_in = c_out
    return params


def apply_conv(params, x, convs, activation: str = "relu"):
    """x: [..., H, W, C] (NHWC). `convs` supplies the STATIC strides (they
    must not live in the traced param pytree). Returns flattened
    features [..., F]."""
    act = _ACTIVATIONS[activation]
    batch_shape = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    for layer, spec in zip(params, convs):
        st = int(spec["strides"])
        x = lax.conv_general_dilated(
            x, layer["w"],
            window_strides=(st, st),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = act(x + layer["b"])
    return x.reshape(batch_shape + (-1,))


def conv_output_dim(in_shape: Tuple[int, int, int],
                    convs: Sequence[Dict[str, int]]) -> int:
    h, w, c = in_shape
    for spec in convs:
        ks, st = int(spec["kernel_size"]), int(spec["strides"])
        h = (h - ks) // st + 1
        w = (w - ks) // st + 1
        c = int(spec["filters"])
    return h * w * c


# ---------------------------------------------------------------------------
# recurrent cells (network_builder.py:_build_rnn; lstm/gru)
# ---------------------------------------------------------------------------


def init_lstm(key, in_dim: int, units: int, layers: int = 1):
    params = []
    d = in_dim
    for k in jax.random.split(key, layers):
        ki, kh = jax.random.split(k)
        params.append({
            "wi": _orthogonal(ki, (4 * units, d), 1.0).astype(jnp.float32),
            "wh": _orthogonal(kh, (4 * units, units), 1.0).astype(jnp.float32),
            "b": jnp.zeros((4 * units,), jnp.float32),
        })
        d = units
    return params


def lstm_step(params, x, state):
    """One step through the stacked LSTM. state: list of (h, c)."""
    new_state = []
    for layer, (h, c) in zip(params, state):
        gates = x @ layer["wi"].T + h @ layer["wh"].T + layer["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        new_state.append((h, c))
        x = h
    return x, new_state


def init_gru(key, in_dim: int, units: int, layers: int = 1):
    params = []
    d = in_dim
    for k in jax.random.split(key, layers):
        ki, kh = jax.random.split(k)
        params.append({
            "wi": _orthogonal(ki, (3 * units, d), 1.0).astype(jnp.float32),
            "wh": _orthogonal(kh, (3 * units, units), 1.0).astype(jnp.float32),
            "b": jnp.zeros((3 * units,), jnp.float32),
        })
        d = units
    return params


def gru_step(params, x, state):
    """One step through the stacked GRU. state: list of (h,) tuples."""
    new_state = []
    for layer, (h,) in zip(params, state):
        wi_r, wi_z, wi_n = jnp.split(layer["wi"], 3, axis=0)
        wh_r, wh_z, wh_n = jnp.split(layer["wh"], 3, axis=0)
        b_r, b_z, b_n = jnp.split(layer["b"], 3, axis=-1)
        r = jax.nn.sigmoid(x @ wi_r.T + h @ wh_r.T + b_r)
        z = jax.nn.sigmoid(x @ wi_z.T + h @ wh_z.T + b_z)
        n = jnp.tanh(x @ wi_n.T + r * (h @ wh_n.T) + b_n)
        h = (1.0 - z) * n + z * h
        new_state.append((h,))
        x = h
    return x, new_state


# ---------------------------------------------------------------------------
# categorical distribution helpers (a2c_discrete action space)
# ---------------------------------------------------------------------------


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits, actions):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_kl(old_logits, new_logits):
    """KL(old || new), the direction rl_games' scheduler uses."""
    old_lp = jax.nn.log_softmax(old_logits, axis=-1)
    new_lp = jax.nn.log_softmax(new_logits, axis=-1)
    return jnp.sum(jnp.exp(old_lp) * (old_lp - new_lp), axis=-1)


# ---------------------------------------------------------------------------
# the config-driven actor-critic network
# ---------------------------------------------------------------------------


class A2CNetwork:
    """Actor-critic assembled from a YAML ``network`` tree.

    Pipeline per trunk: [cnn] -> flatten -> [rnn if before_mlp] -> mlp ->
    [rnn if after mlp] -> heads. Action space: "continuous" (mu + logstd,
    fixed_sigma), "discrete" (one logits head over `action_dim` choices),
    or "multi_discrete" (one logits head per entry of `action_dims`).

    ``apply`` returns ``(head_out, value, rnn_state)`` where head_out is
    ``(mu, sigma)`` for continuous or logits (list of logits for
    multi_discrete). For RNN-less networks rnn_state is passed through
    unchanged (None).
    """

    def __init__(self, obs_shape, action_dim, cfg_network: Optional[Dict[str, Any]] = None,
                 action_dims: Optional[Sequence[int]] = None):
        cfg = cfg_network or {}
        self.obs_shape = tuple(obs_shape) if not isinstance(obs_shape, int) else (obs_shape,)
        self.separate = bool(cfg.get("separate", False))

        space = cfg.get("space", {"continuous": {}})
        if "multi_discrete" in space:
            self.space = "multi_discrete"
            if action_dims is None:
                raise ValueError("multi_discrete needs action_dims")
            self.action_dims = [int(n) for n in action_dims]
        elif "discrete" in space:
            self.space = "discrete"
            self.action_dims = [int(action_dim)]
        else:
            self.space = "continuous"
            self.action_dim = int(action_dim)
            cont = space.get("continuous", {}) or {}
            self.fixed_sigma = bool(cont.get("fixed_sigma", True))
            si = cont.get("sigma_init", {})
            self.sigma_init = float((si or {}).get("val", 0.0) or 0.0)

        self.cnn_cfg = cfg.get("cnn")
        if self.cnn_cfg is not None and len(self.obs_shape) != 3:
            raise ValueError("cnn requires [H, W, C] observations")
        self.cnn_activation = (self.cnn_cfg or {}).get("activation", "relu")

        mlp_cfg = cfg.get("mlp", {})
        self.mlp_units = list(mlp_cfg.get("units", [256, 128]))
        self.mlp_activation = mlp_cfg.get("activation", "elu")

        rnn_cfg = cfg.get("rnn")
        self.rnn_name = (rnn_cfg or {}).get("name")
        self.rnn_units = int((rnn_cfg or {}).get("units", 256)) if rnn_cfg else 0
        self.rnn_layers = int((rnn_cfg or {}).get("layers", 1)) if rnn_cfg else 0
        self.rnn_before_mlp = bool((rnn_cfg or {}).get("before_mlp", False))

        # feature dims through the pipeline
        if self.cnn_cfg is not None:
            feat = conv_output_dim(self.obs_shape, self.cnn_cfg["convs"])
        else:
            feat = int(self.obs_shape[0])
        self._flat_dim = feat
        if self.rnn_name and self.rnn_before_mlp:
            self._rnn_in = feat
            feat = self.rnn_units
        self._mlp_dims = [feat] + self.mlp_units
        feat = self.mlp_units[-1] if self.mlp_units else feat
        if self.rnn_name and not self.rnn_before_mlp:
            self._rnn_in = feat
            feat = self.rnn_units
        self._head_in = feat

    # ------------------------------------------------------------- params

    def _init_trunk(self, key):
        kc, kr, km = jax.random.split(key, 3)
        trunk = {}
        if self.cnn_cfg is not None:
            trunk["cnn"] = init_conv(kc, self.obs_shape[-1], self.cnn_cfg["convs"])
        if self.rnn_name == "lstm":
            trunk["rnn"] = init_lstm(kr, self._rnn_in, self.rnn_units, self.rnn_layers)
        elif self.rnn_name == "gru":
            trunk["rnn"] = init_gru(kr, self._rnn_in, self.rnn_units, self.rnn_layers)
        elif self.rnn_name:
            raise ValueError(f"unknown rnn {self.rnn_name}")
        if self.mlp_units:
            trunk["mlp"] = init_mlp(km, self._mlp_dims, layer_norm=False)
        return trunk

    def init(self, key):
        kt, kt2, kh, kv, ks = jax.random.split(key, 5)
        params: Dict[str, Any] = {"trunk": self._init_trunk(kt)}
        if self.separate:
            params["trunk_critic"] = self._init_trunk(kt2)
        if self.space == "continuous":
            params["mu"] = init_mlp(kh, [self._head_in, self.action_dim],
                                    gain=0.01, layer_norm=False)
            if self.fixed_sigma:
                params["logstd"] = jnp.full((self.action_dim,), self.sigma_init,
                                            dtype=jnp.float32)
            else:
                params["sigma_head"] = init_mlp(ks, [self._head_in, self.action_dim],
                                                gain=0.01, layer_norm=False)
        else:
            heads = []
            for i, n in enumerate(self.action_dims):
                kh, sub = jax.random.split(kh)
                heads.append(init_mlp(sub, [self._head_in, n], gain=0.01,
                                      layer_norm=False))
            params["logits"] = heads
        params["value"] = init_mlp(kv, [self._head_in, 1], gain=1.0,
                                   layer_norm=False)
        return params

    def initial_rnn_state(self, batch_shape=()):
        """Zero hidden state, a pytree scannable alongside the obs batch."""
        if not self.rnn_name:
            return None
        shape = tuple(batch_shape) + (self.rnn_units,)
        zeros = jnp.zeros(shape, jnp.float32)
        per_layer = (zeros, zeros) if self.rnn_name == "lstm" else (zeros,)
        return [tuple(jnp.zeros_like(z) for z in per_layer)
                for _ in range(self.rnn_layers)]

    # -------------------------------------------------------------- apply

    def _trunk_features(self, trunk, obs, rnn_state):
        x = obs
        if self.cnn_cfg is not None:
            x = apply_conv(trunk["cnn"], x, self.cnn_cfg["convs"],
                           self.cnn_activation)
        if self.rnn_name and self.rnn_before_mlp:
            step = lstm_step if self.rnn_name == "lstm" else gru_step
            x, rnn_state = step(trunk["rnn"], x, rnn_state)
        if self.mlp_units:
            # plain MLP trunk, activation on every layer (rl_games trunk has
            # no final linear "output" layer — heads attach to the last unit)
            act = _ACTIVATIONS[self.mlp_activation]
            for layer in trunk["mlp"]:
                x = act(x @ layer["w"].T + layer["b"])
        if self.rnn_name and not self.rnn_before_mlp:
            step = lstm_step if self.rnn_name == "lstm" else gru_step
            x, rnn_state = step(trunk["rnn"], x, rnn_state)
        return x, rnn_state

    def apply(self, params, obs, rnn_state=None):
        h, new_state = self._trunk_features(params["trunk"], obs, rnn_state)
        if self.separate:
            hc, _ = self._trunk_features(params["trunk_critic"], obs, rnn_state)
        else:
            hc = h
        value = apply_mlp(params["value"], hc)[..., 0]

        if self.space == "continuous":
            mu = apply_mlp(params["mu"], h)
            if self.fixed_sigma:
                sigma = jnp.broadcast_to(jnp.exp(params["logstd"]), mu.shape)
            else:
                sigma = jnp.exp(apply_mlp(params["sigma_head"], h))
            return (mu, sigma), value, new_state
        logits = [apply_mlp(head, h) for head in params["logits"]]
        if self.space == "discrete":
            return logits[0], value, new_state
        return logits, value, new_state

    # --------------------------------------------- distribution utilities

    def sample(self, key, head_out):
        if self.space == "continuous":
            mu, sigma = head_out
            return mu + sigma * jax.random.normal(key, mu.shape)
        if self.space == "discrete":
            return categorical_sample(key, head_out)
        keys = jax.random.split(key, len(head_out))
        return jnp.stack(
            [categorical_sample(k, lg) for k, lg in zip(keys, head_out)],
            axis=-1,
        )

    def log_prob(self, head_out, actions):
        if self.space == "continuous":
            mu, sigma = head_out
            return jnp.sum(
                -0.5 * ((actions - mu) / sigma) ** 2 - jnp.log(sigma)
                - 0.5 * math.log(2.0 * math.pi), axis=-1,
            )
        if self.space == "discrete":
            return categorical_log_prob(head_out, actions)
        return sum(
            categorical_log_prob(lg, actions[..., i])
            for i, lg in enumerate(head_out)
        )

    def entropy(self, head_out):
        if self.space == "continuous":
            _, sigma = head_out
            return jnp.sum(jnp.log(sigma) + 0.5 * math.log(2.0 * math.pi * math.e),
                           axis=-1)
        if self.space == "discrete":
            return categorical_entropy(head_out)
        return sum(categorical_entropy(lg) for lg in head_out)

    def kl(self, old_head_out, head_out):
        """Mean KL(old || new) over the batch, for the adaptive LR."""
        if self.space == "continuous":
            old_mu, old_sigma = old_head_out
            mu, sigma = head_out
            return jnp.mean(jnp.sum(
                jnp.log(sigma / old_sigma)
                + (old_sigma ** 2 + (mu - old_mu) ** 2) / (2.0 * sigma ** 2)
                - 0.5, axis=-1,
            ))
        if self.space == "discrete":
            return jnp.mean(categorical_kl(old_head_out, head_out))
        return jnp.mean(sum(
            categorical_kl(o, n) for o, n in zip(old_head_out, head_out)
        ))
