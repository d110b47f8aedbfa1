"""Headline benchmark: Ant env-steps/s at 4096 envs on one chip.

Mirrors the reference's fps harness (/root/reference/examples/test_env.py:49-64
prints ``fps = 1000*num_envs/elapsed``) at the BASELINE.json target scale
(4096 Ant envs, 16 substeps, MM_caching_frequency=16, random actions).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is measured against BASELINE_STEPS_PER_S, an estimate of the
reference dflex CUDA implementation's throughput at this scale (the reference
publishes no numeric tables — BASELINE.md; dflex Ant at 1000-4000 envs on the
paper-era GPUs sustains on the order of 1e5 env-steps/s).
"""

import json
import time

import jax

import diffrl_tpu.envs as envs

BASELINE_STEPS_PER_S = 100_000.0

NUM_ENVS = 4096
WARMUP_STEPS = 5
MEASURE_STEPS = 60


def main():
    env = envs.make(
        "Ant",
        num_envs=NUM_ENVS,
        seed=0,
        stochastic_init=True,
        episode_length=1000,
        MM_caching_frequency=16,
    )

    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def step_fn(state, key):
        key, sub = jax.random.split(key)
        actions = jax.random.uniform(
            sub, (env.num_envs, env.num_acts), minval=-1.0, maxval=1.0
        )
        state, obs, rew, done, _ = env.step(state, actions)
        return state, key, rew

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP_STEPS):
        state, key, rew = step_fn(state, key)
    jax.block_until_ready(rew)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, key, rew = step_fn(state, key)
    jax.block_until_ready(rew)
    elapsed = time.perf_counter() - t0

    steps_per_s = MEASURE_STEPS * NUM_ENVS / elapsed
    print(
        json.dumps(
            {
                "metric": "ant_env_steps_per_s_per_chip_4096envs",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
