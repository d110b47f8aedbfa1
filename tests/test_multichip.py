"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference's only multi-device path is Horovod data-parallel for PPO/SAC
(untested in-repo, SURVEY.md §4). Here the env axis shards over a ``data``
mesh and XLA inserts the cross-device reductions; these tests execute the
FULL SHAC training step sharded, which the driver also validates via
__graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffrl_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_and_sharding_placement():
    mesh = mesh_lib.make_data_mesh(8)
    x = jnp.zeros((16, 5))
    tree = mesh_lib.shard_env_axis(mesh, {"a": x, "k": jax.random.PRNGKey(0)})
    shards = tree["a"].sharding
    assert shards.num_devices == 8
    # scalar-ish leaves replicate
    assert tree["k"].sharding.is_fully_replicated


def test_sharded_shac_training_step():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multi_gpu_flag_trains_sharded_epoch():
    """The reference `multi_gpu` config flag, TPU-style: envs shard over
    the mesh and one full train_epoch executes with finite outputs."""
    from diffrl_tpu.algorithms.shac import SHAC

    cfg = {
        "params": {
            "diff_env": {
                "name": "CartPoleSwingUpEnv",
                "stochastic_env": True,
                "episode_length": 16,
                "MM_caching_frequency": 4,
            },
            "network": {
                "actor": "ActorStochasticMLP",
                "actor_mlp": {"units": [16, 16], "activation": "elu"},
                "critic_mlp": {"units": [16, 16], "activation": "elu"},
            },
            "config": {
                "name": "multigpu_test",
                "num_actors": 16,
                "steps_num": 4,
                "max_epochs": 1,
                "actor_learning_rate": 1e-3,
                "critic_learning_rate": 1e-3,
                "critic_iterations": 2,
                "num_batch": 2,
                "obs_rms": True,
                "critic_method": "td-lambda",
                "save_interval": 0,
                "multi_gpu": True,
            },
            "general": {"seed": 0, "logdir": "/tmp/diffrl_multigpu_test"},
        }
    }
    shac = SHAC(cfg)
    assert shac.mesh is not None and shac.mesh.size == 8
    assert shac.env_state.joint_q.sharding.num_devices == 8
    shac.train()
    assert np.isfinite(shac.actor_loss) and np.isfinite(shac.value_loss)


def test_cross_device_rms_reduction():
    """RunningMeanStd moments agree whether computed sharded or locally."""
    from diffrl_tpu.utils import RunningMeanStd

    mesh = mesh_lib.make_data_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    xs = mesh_lib.shard_env_axis(mesh, x)

    @jax.jit
    def update(rms, batch):
        return rms.update(batch)

    r1 = update(RunningMeanStd.create((3,)), xs)
    r2 = RunningMeanStd.create((3,)).update(x)
    np.testing.assert_allclose(np.asarray(r1.mean), np.asarray(r2.mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.var), np.asarray(r2.var), rtol=1e-4)
