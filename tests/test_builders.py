"""Config-driven network builders (CNN / RNN / discrete heads) and the
head-generic PPO path.

Reference capability: rl_games A2CBuilder network family
(/root/reference/externals/rl_games/rl_games/algos_torch/network_builder.py)
and the a2c_discrete algorithm (torch_runner.py:23). The dflex configs never
exercise these; the tests use toy vector/image envs instead."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.models.builders import (
    A2CNetwork,
    apply_conv,
    categorical_entropy,
    categorical_kl,
    categorical_log_prob,
    conv_output_dim,
    gru_step,
    init_conv,
    init_gru,
    init_lstm,
    lstm_step,
)


# ---------------------------------------------------------------------------
# unit: conv / rnn / categorical primitives
# ---------------------------------------------------------------------------

def test_conv_output_shape_matches_analytic():
    convs = [
        {"filters": 8, "kernel_size": 3, "strides": 2},
        {"filters": 4, "kernel_size": 3, "strides": 1},
    ]
    params = init_conv(jax.random.PRNGKey(0), 2, convs)
    x = jnp.ones((5, 12, 12, 2))
    y = apply_conv(params, x, convs)
    assert y.shape == (5, conv_output_dim((12, 12, 2), convs))
    # leading batch dims pass through
    y2 = apply_conv(params, jnp.ones((3, 5, 12, 12, 2)), convs)
    assert y2.shape == (3, 5, conv_output_dim((12, 12, 2), convs))


@pytest.mark.parametrize("kind", ["lstm", "gru"])
def test_rnn_step_gradients_and_state(kind):
    init, step = (init_lstm, lstm_step) if kind == "lstm" else (init_gru, gru_step)
    params = init(jax.random.PRNGKey(0), 6, 8, layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    # nonzero hidden state: wh gradients are identically zero at h=0
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    state = [
        tuple(0.1 * jax.random.normal(ks[2 * i + j], (4, 8))
              for j in range(2 if kind == "lstm" else 1))
        for i in range(2)
    ]
    y, new_state = step(params, x, state)
    assert y.shape == (4, 8)
    assert len(new_state) == 2
    # hidden state actually changes and is differentiable
    assert float(jnp.abs(new_state[0][0]).max()) > 0

    def loss(p):
        out, _ = step(p, x, state)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.any(layer[k] != 0)) for layer in g for k in ("wi", "wh")
    )


def test_categorical_primitives():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    a = jnp.asarray([0, 2])
    lp = categorical_log_prob(logits, a)
    p = jax.nn.softmax(logits)
    np.testing.assert_allclose(np.exp(lp), [p[0, 0], p[1, 2]], rtol=1e-6)
    ent = categorical_entropy(logits)
    np.testing.assert_allclose(ent[1], np.log(3.0), rtol=1e-6)  # uniform
    kl = categorical_kl(logits, logits)
    np.testing.assert_allclose(kl, 0.0, atol=1e-6)
    assert float(categorical_kl(logits, logits + jnp.asarray([1.0, 0.0, 0.0]))[0]) > 0


# ---------------------------------------------------------------------------
# unit: A2CNetwork assembly per space
# ---------------------------------------------------------------------------

def test_a2c_network_continuous_matches_spec():
    net = A2CNetwork(7, 3, {"mlp": {"units": [16, 8]},
                            "space": {"continuous": {"fixed_sigma": True}}})
    params = net.init(jax.random.PRNGKey(0))
    (mu, sigma), value, state = net.apply(params, jnp.ones((4, 7)))
    assert mu.shape == (4, 3) and sigma.shape == (4, 3) and value.shape == (4,)
    assert state is None
    a = net.sample(jax.random.PRNGKey(1), (mu, sigma))
    assert jnp.all(jnp.isfinite(net.log_prob((mu, sigma), a)))


def test_a2c_network_discrete_and_multidiscrete():
    net = A2CNetwork(5, 4, {"mlp": {"units": [16]}, "space": {"discrete": {}}})
    params = net.init(jax.random.PRNGKey(0))
    logits, value, _ = net.apply(params, jnp.ones((6, 5)))
    assert logits.shape == (6, 4)
    a = net.sample(jax.random.PRNGKey(1), logits)
    assert a.shape == (6,) and a.dtype == jnp.int32
    assert net.log_prob(logits, a).shape == (6,)
    assert float(net.kl(logits, logits)) == pytest.approx(0.0, abs=1e-6)

    md = A2CNetwork(5, None, {"mlp": {"units": [16]},
                              "space": {"multi_discrete": {}}},
                    action_dims=[3, 2])
    p2 = md.init(jax.random.PRNGKey(2))
    heads, _, _ = md.apply(p2, jnp.ones((6, 5)))
    assert heads[0].shape == (6, 3) and heads[1].shape == (6, 2)
    a2 = md.sample(jax.random.PRNGKey(3), heads)
    assert a2.shape == (6, 2)
    assert md.log_prob(heads, a2).shape == (6,)


def test_a2c_network_cnn_rnn_separate():
    cfg = {
        "separate": True,
        "cnn": {"convs": [{"filters": 4, "kernel_size": 3, "strides": 2}],
                "activation": "relu"},
        "mlp": {"units": [16]},
        "rnn": {"name": "lstm", "units": 8, "layers": 1},
        "space": {"discrete": {}},
    }
    net = A2CNetwork((8, 8, 1), 3, cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = net.initial_rnn_state((2,))
    obs = jnp.ones((2, 8, 8, 1))
    logits, value, state1 = net.apply(params, obs, state)
    assert logits.shape == (2, 3) and value.shape == (2,)
    # recurrence: same obs, evolved state -> different logits
    logits2, _, _ = net.apply(params, obs, state1)
    assert float(jnp.abs(logits2 - logits).max()) > 1e-6


@pytest.mark.parametrize("kind", ["lstm", "gru"])
def test_rnn_scan_equals_stepwise(kind):
    """Scanning a sequence == feeding steps one at a time (the PPO chunked
    training path depends on this equivalence)."""
    net = A2CNetwork(4, 2, {"mlp": {"units": [8]},
                            "rnn": {"name": kind, "units": 6},
                            "space": {"discrete": {}}})
    params = net.init(jax.random.PRNGKey(0))
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 4))

    state = net.initial_rnn_state((3,))
    outs = []
    for t in range(5):
        lg, _, state = net.apply(params, obs_seq[t], state)
        outs.append(lg)
    stepwise = jnp.stack(outs)

    def scan_step(s, o):
        lg, _, s = net.apply(params, o, s)
        return s, lg

    _, scanned = jax.lax.scan(scan_step, net.initial_rnn_state((3,)), obs_seq)
    np.testing.assert_allclose(np.asarray(stepwise), np.asarray(scanned),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: PPO with discrete / cnn / rnn networks on toy envs
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class _ToyState:
    target: jnp.ndarray   # [E] int32 — which action pays
    progress: jnp.ndarray


class _ToyDiscreteEnv:
    """Contextual bandit chain: obs one-hot encodes the paying action."""

    num_obs = 4
    num_acts = 4
    episode_length = 8

    def __init__(self, num_envs=16, image=False, seed=0):
        self.num_envs = num_envs
        self.image = image
        if image:
            self.obs_shape = (6, 6, 1)

    def reset(self, key):
        target = jax.random.randint(key, (self.num_envs,), 0, self.num_acts)
        return _ToyState(target=target,
                         progress=jnp.zeros(self.num_envs, jnp.int32))

    def batch_observations(self, state):
        onehot = jax.nn.one_hot(state.target, self.num_acts)
        if not self.image:
            return onehot
        # paint the one-hot into quadrants of a 6x6 image
        img = jnp.zeros((self.num_envs, 6, 6, 1))
        img = img.at[:, 0:3, 0:3, 0].add(onehot[:, 0, None, None])
        img = img.at[:, 0:3, 3:6, 0].add(onehot[:, 1, None, None])
        img = img.at[:, 3:6, 0:3, 0].add(onehot[:, 2, None, None])
        img = img.at[:, 3:6, 3:6, 0].add(onehot[:, 3, None, None])
        return img

    def step(self, state, actions):
        rew = (actions == state.target).astype(jnp.float32)
        progress = state.progress + 1
        done = progress >= self.episode_length
        key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.sum(progress))
        new_target = jax.random.randint(key, (self.num_envs,), 0, self.num_acts)
        state = _ToyState(
            target=jnp.where(done, new_target, state.target),
            progress=jnp.where(done, 0, progress),
        )
        return state, self.batch_observations(state), rew, done, {}


def _ppo_cfg(network, num_envs=16, steps=8, epochs=30, **config_extra):
    config = dict(
        name="toy", num_actors=num_envs, steps_num=steps,
        minibatch_size=num_envs * steps // 2, mini_epochs=2,
        learning_rate=5e-3, lr_schedule="constant", gamma=0.9, tau=0.95,
        normalize_input=False, normalize_value=False, save_frequency=0,
        max_epochs=epochs, **config_extra,
    )
    return {"params": {"diff_env": {"name": "unused"}, "network": network,
                       "config": config, "general": {"logdir": "/tmp/toy_ppo",
                                                     "seed": 0}}}


def test_ppo_discrete_learns_bandit():
    from diffrl_tpu.algorithms.ppo import PPO

    env = _ToyDiscreteEnv(num_envs=16)
    ppo = PPO(_ppo_cfg({"mlp": {"units": [32]}, "space": {"discrete": {}}}),
              env=env)
    assert ppo.use_builder
    ppo.train()
    # optimal = 1.0/step * 8 steps; random = 0.25 * 8 = 2
    rew, _ = ppo.evaluate_policy(1, deterministic=True)
    assert rew > 6.0, f"discrete PPO failed to learn: eval reward {rew}"


def test_ppo_cnn_runs_and_improves():
    from diffrl_tpu.algorithms.ppo import PPO

    env = _ToyDiscreteEnv(num_envs=8, image=True)
    net = {"cnn": {"convs": [{"filters": 4, "kernel_size": 3, "strides": 2}],
                   "activation": "relu"},
           "mlp": {"units": [16]},
           "space": {"discrete": {}}}
    ppo = PPO(_ppo_cfg(net, num_envs=8, epochs=25), env=env)
    ppo.train()
    rew, _ = ppo.evaluate_policy(1, deterministic=True)
    assert rew > 4.0, f"cnn PPO eval reward {rew}"


def test_ppo_rnn_trains_finite():
    from diffrl_tpu.algorithms.ppo import PPO

    env = _ToyDiscreteEnv(num_envs=8)
    net = {"mlp": {"units": [16]},
           "rnn": {"name": "gru", "units": 8},
           "space": {"discrete": {}}}
    ppo = PPO(_ppo_cfg(net, num_envs=8, epochs=10, seq_length=4), env=env)
    ppo.train()
    rew, _ = ppo.evaluate_policy(1, deterministic=True)
    assert np.isfinite(rew)
    assert rew > 2.0, f"rnn PPO eval reward {rew} (random = 2.0)"


def test_ppo_continuous_path_unchanged():
    """The default continuous config must NOT route through the builder."""
    from diffrl_tpu.algorithms.ppo import PPO
    from diffrl_tpu.models import ActorCriticPPO

    cfg = _ppo_cfg({"mlp": {"units": [16]},
                    "space": {"continuous": {"fixed_sigma": True}}},
                   epochs=1)
    cfg["params"]["diff_env"] = {"name": "CartPoleSwingUp",
                                 "episode_length": 16}
    cfg["params"]["config"]["num_actors"] = 4
    cfg["params"]["config"]["minibatch_size"] = 32
    ppo = PPO(cfg)
    assert not ppo.use_builder
    assert isinstance(ppo.network, ActorCriticPPO)
