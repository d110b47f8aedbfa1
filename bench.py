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

# hardware peaks for the roofline/MFU figures (docs/PERF_NOTES.md "MFU"):
# TPU v5e: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM. The engine is
# elementwise/bandwidth-dominated, so HBM utilization is the meaningful
# roofline axis; MFU vs MXU peak is reported for completeness.
_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "cpu": (None, None),
}


def _roofline(compiled, elapsed_per_call):
    """flops + bytes from XLA cost analysis -> (mfu, hbm_util) or Nones."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None, None, None
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = _PEAKS.get(kind, (None, None))
    mfu = (flops / elapsed_per_call) / peak_flops if peak_flops else None
    hbm = (bytes_accessed / elapsed_per_call) / peak_bw if peak_bw else None
    return flops, bytes_accessed, mfu, hbm


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

    out = {
        "metric": "ant_env_steps_per_s_per_chip_4096envs",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
    }
    flops, bytes_accessed, mfu, hbm = _roofline(
        step_fn.lower(state, key).compile(), elapsed / MEASURE_STEPS
    )
    if flops is not None:
        out["flops_per_env_step"] = round(flops / NUM_ENVS)
        out["bytes_per_env_step"] = round(bytes_accessed / NUM_ENVS)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    if hbm is not None:
        out["hbm_util"] = round(hbm, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
