"""Weak-scaling benchmark: env-steps/s over a `data` mesh of N devices.

Roadmap item 4 (BASELINE.json target: >=8x scaling 1 chip -> 1 host). Envs
shard over the mesh's data axis (the framework's only parallel axis, like
the reference's Horovod data parallelism); each device simulates its local
shard with zero cross-device traffic during rollout, so weak scaling should
be near-linear — this harness measures it.

On a real pod slice:
    python tools/bench_scaling.py --env Ant --envs-per-device 1024
On the CPU virtual mesh (harness validation, not perf):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --cpu --envs-per-device 8 --steps 4

Prints one JSON line per mesh size with per-device throughput and
efficiency vs the single-device run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Ant")
    ap.add_argument("--envs-per-device", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mm-freq", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the (virtual) CPU platform")
    ap.add_argument("--sizes", default="",
                    help="comma-separated mesh sizes (default 1,2,4,...,N)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import diffrl_tpu.envs as envs
    from diffrl_tpu.parallel import mesh as mesh_lib

    ndev = len(jax.devices())
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [1]
        while sizes[-1] * 2 <= ndev:
            sizes.append(sizes[-1] * 2)

    base = None
    for n in sizes:
        E = args.envs_per_device * n
        env = envs.make(
            args.env, num_envs=E, seed=0, stochastic_init=True,
            episode_length=1000, MM_caching_frequency=args.mm_freq,
        )
        mesh = mesh_lib.make_data_mesh(n)
        state = mesh_lib.shard_env_axis(mesh, env.reset(jax.random.PRNGKey(0)), E)

        @jax.jit
        def step_fn(state, key):
            key, sub = jax.random.split(key)
            actions = jax.random.uniform(
                sub, (env.num_envs, env.num_acts), minval=-1.0, maxval=1.0
            )
            state, obs, rew, done, _ = env.step(state, actions)
            return state, key, rew

        key = jax.random.PRNGKey(1)
        for _ in range(args.warmup):
            state, key, rew = step_fn(state, key)
        jax.block_until_ready(rew)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, key, rew = step_fn(state, key)
        jax.block_until_ready(rew)
        dt = time.perf_counter() - t0

        sps = args.steps * E / dt
        per_dev = sps / n
        if base is None:
            base = per_dev
        print(json.dumps({
            "devices": n,
            "num_envs": E,
            "env_steps_per_s": round(sps, 1),
            "per_device": round(per_dev, 1),
            "weak_scaling_efficiency": round(per_dev / base, 3),
        }))


if __name__ == "__main__":
    main()
