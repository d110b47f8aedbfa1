"""Trainer smoke + learning tests on the CPU oracle backend.

Equivalent of the reference's end-to-end checks (examples/test_env.py +
manual short trainings): each algorithm builds from a YAML-shaped cfg dict,
runs a few epochs on a tiny CartPole fleet, and must produce finite losses
and updated parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.algorithms import BPTT, PPO, SAC, SHAC, Runner


def _base_cfg(extra_config=None, algo=None, network=None):
    cfg = {
        "params": {
            "diff_env": {
                "name": "CartPoleSwingUpEnv",
                "stochastic_env": True,
                "episode_length": 32,
                "MM_caching_frequency": 4,
            },
            "network": network or {
                "actor": "ActorStochasticMLP",
                "actor_mlp": {"units": [16, 16], "activation": "elu"},
                "critic_mlp": {"units": [16, 16], "activation": "elu"},
            },
            "config": {
                "name": "test",
                "num_actors": 4,
                "steps_num": 8,
                "max_epochs": 2,
                "actor_learning_rate": 1e-3,
                "critic_learning_rate": 1e-3,
                "save_interval": 0,
                "save_frequency": 0,
                **(extra_config or {}),
            },
            "general": {"seed": 0, "logdir": "/tmp/diffrl_test_logs"},
        }
    }
    if algo:
        cfg["params"]["algo"] = {"name": algo}
    return cfg


def _params_changed(before, after):
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)), before, after)
    )
    return max(float(d) for d in diffs) > 0.0


def test_shac_critic_update_uneven_batches():
    """The critic minibatcher pads the shuffled dataset when batch_size does
    not divide H*E (shac.py critic_update): padded rows carry weight 0, so
    the result must stay finite and step the params."""
    shac = SHAC(_base_cfg({"critic_method": "td-lambda", "obs_rms": True,
                           "critic_iterations": 2, "num_batch": 2,
                           "num_actors": 3, "steps_num": 3}))
    n = shac.num_envs * shac.steps_num
    assert ((n - 1) // shac.batch_size + 1) * shac.batch_size > n  # pad path
    obs = jax.random.normal(jax.random.PRNGKey(0), (n, shac.num_obs))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (n,))
    params, _, loss = shac._critic_update(
        shac.critic_params, shac.critic_opt_state, obs, tgt,
        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert _params_changed(shac.critic_params, params)


def test_shac_two_epochs():
    shac = SHAC(_base_cfg({"critic_method": "td-lambda", "obs_rms": True,
                           "critic_iterations": 2, "num_batch": 2}))
    before = jax.tree.map(jnp.copy, shac.actor_params)
    shac.train()
    assert np.isfinite(shac.actor_loss)
    assert np.isfinite(shac.value_loss)
    assert _params_changed(before, shac.actor_params)


def test_bptt_two_epochs():
    bptt = BPTT(_base_cfg({"obs_rms": True}, algo="adam"))
    before = jax.tree.map(jnp.copy, bptt.actor_params)
    bptt.train()
    assert np.isfinite(bptt.actor_loss)
    assert _params_changed(before, bptt.actor_params)


def test_bptt_lbfgs():
    """LBFGS option (reference algorithms/bptt.py:100): zoom-linesearch
    steps that re-run the rollout as the loss closure."""
    bptt = BPTT(_base_cfg({"lr_schedule": "constant"}, algo="lbfgs"))
    before = jax.tree.map(jnp.copy, bptt.actor_params)
    bptt.train()
    assert np.isfinite(bptt.actor_loss)
    assert _params_changed(before, bptt.actor_params)


def test_ppo_two_epochs():
    cfg = _base_cfg(
        {
            "learning_rate": 3e-4, "minibatch_size": 16, "mini_epochs": 2,
            "normalize_input": True, "normalize_value": True,
            "reward_shaper": {"scale_value": 0.1},
        },
        algo="a2c_continuous",
        network={
            "mlp": {"units": [16, 16], "activation": "elu"},
            "space": {"continuous": {"sigma_init": {"val": 0.0}}},
        },
    )
    ppo = PPO(cfg)
    before = jax.tree.map(jnp.copy, ppo.net_params)
    ppo.train()
    assert _params_changed(before, ppo.net_params)
    assert np.isfinite(float(ppo.cur_lr))


def test_sac_epochs_with_seed_phase():
    cfg = _base_cfg(
        {
            "num_steps_per_episode": 8, "batch_size": 32,
            "replay_buffer_size": 1000, "num_seed_steps": 1,
            "max_epochs": 3, "normalize_input": True,
            "actor_lr": 1e-3, "critic_lr": 1e-3, "alpha_lr": 1e-3,
        },
        algo="sac",
        network={
            "mlp": {"units": [16, 16], "activation": "relu"},
            "critic_mlp": {"units": [16, 16], "activation": "relu"},
            "log_std_bounds": [-5, 2],
        },
    )
    sac = SAC(cfg)
    before = jax.tree.map(jnp.copy, sac.actor_params)
    sac.train()
    assert _params_changed(before, sac.actor_params)
    assert np.isfinite(float(sac.log_alpha))
    # buffer accumulated 3 epochs x 8 steps x 4 envs transitions
    assert int(sac.buffer["count"]) == 3 * 8 * 4


def test_runner_dispatch():
    cfg = _base_cfg({"obs_rms": False}, algo="bptt")
    runner = Runner()
    runner.load(cfg)
    agent = runner.run({"train": True})
    assert isinstance(agent, BPTT)


def test_shac_checkpoint_roundtrip(tmp_path):
    cfg = _base_cfg({"critic_method": "td-lambda", "obs_rms": True,
                     "critic_iterations": 2, "num_batch": 2})
    cfg["params"]["general"]["logdir"] = str(tmp_path)
    shac = SHAC(cfg)
    shac.train()
    shac2 = SHAC(cfg)
    shac2.load(str(tmp_path / "final_policy.pkl"))
    for a, b in zip(jax.tree.leaves(shac.actor_params),
                    jax.tree.leaves(shac2.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert shac2.iter_count == shac.iter_count


def test_shac_deterministic_across_runs():
    """Same seed => bitwise-identical parameters after an epoch (the CPU
    oracle's determinism guarantee; the reference needs special cuBLAS
    modes for this, utils/common.py:83-95)."""
    cfg = _base_cfg({"critic_method": "td-lambda", "obs_rms": True,
                     "critic_iterations": 2, "num_batch": 2,
                     "max_epochs": 1})
    outs = []
    for _ in range(2):
        shac = SHAC(cfg)
        shac.train()
        outs.append(jax.tree.leaves(shac.actor_params))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
