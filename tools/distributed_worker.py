"""Multi-process (jax.distributed) SHAC worker.

One process of an N-process data-parallel SHAC run: initializes the
distributed runtime (DCN analog — on localhost CPU the same gRPC
coordinator/collective path a multi-host TPU pod uses), builds the trainer
with `multi_gpu: True` so envs shard over the GLOBAL data mesh, runs one
full jitted SHAC epoch, and prints one JSON result line.

Reference analog: the Horovod wrapper engaged by `multi_gpu: True`
(/root/reference/externals/rl_games/rl_games/distributed/hvd_wrapper.py).

Launched by tests/test_distributed.py (2 processes x 4 virtual CPU
devices) and usable manually:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/distributed_worker.py --coordinator localhost:12345 \
        --num-processes 2 --process-id 0
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--env", default="CartPoleSwingUp")
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--steps-num", type=int, default=8)
    args = ap.parse_args()

    import jax

    # pin CPU BEFORE backend init (the axon TPU plugin ignores JAX_PLATFORMS;
    # two processes must never share the tunneled chip)
    jax.config.update("jax_platforms", "cpu")

    from diffrl_tpu.parallel import mesh as mesh_lib

    mesh_lib.init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp

    from diffrl_tpu.algorithms.shac import SHAC

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == args.num_processes * n_local, (
        f"global devices {n_global} != {args.num_processes} x {n_local}"
    )

    cfg = {
        "params": {
            "diff_env": {"name": args.env, "episode_length": 240,
                         "stochastic_env": True},
            "network": {},
            "config": {
                "num_actors": args.num_envs,
                "steps_num": args.steps_num,
                "max_epochs": 2,
                "actor_learning_rate": 2e-3,
                "critic_learning_rate": 2e-3,
                "critic_iterations": 2,
                "num_batch": 2,
                "multi_gpu": True,
            },
            "general": {"seed": 7, "logdir": f"/tmp/dist_shac_{args.process_id}"},
        }
    }
    shac = SHAC(cfg)
    assert shac.mesh is not None and shac.mesh.size == n_global

    key = jax.random.PRNGKey(100)
    epoch_args = (
        shac.actor_params, shac.actor_opt_state, shac.critic_params,
        shac.critic_opt_state, shac.target_critic_params,
        shac.env_state, shac.obs_rms, shac.ret_rms,
        shac.episode_trackers, key,
    )
    with shac.mesh:
        # AOT-compile BEFORE the first collective: per-process compile time
        # can diverge (cache hits, load), and Gloo's rendezvous inside the
        # first execution times out after ~30s. Compiling first and meeting
        # at a coordinator barrier (10 min budget) makes the execution-time
        # skew milliseconds.
        compiled = shac._train_epoch.lower(*epoch_args).compile()
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier("epoch_compiled", 600_000)
        (actor_params, _, critic_params, _, _, env_state, _, _, _,
         stats) = compiled(*epoch_args)
    actor_loss = float(stats["actor_loss"])
    value_loss = float(stats["value_loss"])
    assert jnp.isfinite(actor_loss) and jnp.isfinite(value_loss)

    print(json.dumps({
        "process_id": args.process_id,
        "processes": jax.process_count(),
        "local_devices": n_local,
        "global_devices": n_global,
        "actor_loss": actor_loss,
        "value_loss": value_loss,
    }), flush=True)


if __name__ == "__main__":
    main()
