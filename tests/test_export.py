"""Policy export/serving tests (StableHLO via jax.export).

The reference has no serving path; this pins the deployment contract:
artifact round-trips bit-exactly, is batch-polymorphic, and the
checkpoint -> inference-fn builder reproduces the evaluation policy.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from diffrl_tpu.models.mlp import ActorStochasticMLP
from diffrl_tpu.utils.export import export_fn, load_exported, shac_policy_fn
from diffrl_tpu.utils.running_mean_std import RunningMeanStd


def _make_actor(obs_dim=5, act_dim=2):
    actor = ActorStochasticMLP(obs_dim, act_dim, {"actor_mlp": {"units": [16, 16]}})
    params = actor.init(jax.random.PRNGKey(0))
    return actor, params


def test_export_roundtrip_exact(tmp_path):
    actor, params = _make_actor()

    def policy(obs):
        return jnp.tanh(actor(params, obs, deterministic=True))

    obs = np.random.RandomState(0).randn(7, 5).astype(np.float32)
    path = os.path.join(tmp_path, "p.shlo")
    export_fn(policy, (obs,), path=path)

    loaded = load_exported(path)
    np.testing.assert_array_equal(np.asarray(loaded(obs)), np.asarray(policy(obs)))


def test_export_batch_polymorphic(tmp_path):
    actor, params = _make_actor()

    def policy(obs):
        return jnp.tanh(actor(params, obs, deterministic=True))

    data = export_fn(policy, (np.zeros((1, 5), np.float32),))
    loaded = load_exported(data)
    for batch in (1, 3, 64):
        obs = np.random.RandomState(batch).randn(batch, 5).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(loaded(obs)), np.asarray(policy(obs)), rtol=1e-6, atol=1e-6
        )


def test_shac_policy_fn_from_checkpoint(tmp_path):
    actor, params = _make_actor()
    rms = RunningMeanStd.create((5,))
    rms = rms.update(jnp.arange(50, dtype=jnp.float32).reshape(10, 5))

    ckpt = os.path.join(tmp_path, "best_policy.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(
            {
                "actor": jax.tree.map(np.asarray, params),
                "obs_rms": jax.tree.map(np.asarray, rms),
            },
            f,
        )

    cfg = {"params": {"network": {"actor": "ActorStochasticMLP",
                                  "actor_mlp": {"units": [16, 16]}}}}
    policy, obs_dim, act_dim = shac_policy_fn(ckpt, cfg)
    assert (obs_dim, act_dim) == (5, 2)

    obs = np.random.RandomState(1).randn(4, 5).astype(np.float32)
    expect = jnp.tanh(actor(params, rms.normalize(jnp.asarray(obs)),
                            deterministic=True))
    np.testing.assert_allclose(np.asarray(policy(obs)), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)
