"""Profile the backward pass of a SHAC-style rollout window on Ant.

Roadmap item 1 (docs/ROADMAP.md): gradient of a 32-step window runs at
~9.9x forward cost. This script measures forward vs. grad throughput and
dumps a per-op device-time summary of each so the dominant backward ops
(scatter transposes, fused loops, transposed matmuls) are visible.

Usage:
    python tools/profile_backward.py [--envs 4096] [--steps 8] [--trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import diffrl_tpu.envs as envs
from diffrl_tpu.utils.profiling import summarize_trace, trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--env", default="Ant")
    ap.add_argument("--mm-freq", type=int, default=16)
    ap.add_argument("--ckpt-step", action="store_true",
                    help="jax.checkpoint the whole env.step in the window")
    ap.add_argument("--granularity", type=int, default=1,
                    help="substeps per checkpointed region in the sim scan")
    args = ap.parse_args()

    env = envs.make(
        args.env,
        num_envs=args.envs,
        seed=0,
        stochastic_init=True,
        episode_length=1000,
        MM_caching_frequency=args.mm_freq,
        remat_granularity=args.granularity,
    )
    state0 = env.reset(jax.random.PRNGKey(0))
    H = args.steps

    # constant per-step action parameterization: grads flow through every step
    def window_loss(actions_seq, state):
        def env_step(st, a):
            st, obs, rew, done, _ = env.step(st, a)
            return st, rew

        if args.ckpt_step:
            env_step = jax.checkpoint(env_step, prevent_cse=False)

        def step_fn(carry, a):
            return env_step(carry, a)

        state, rews = jax.lax.scan(step_fn, state, actions_seq)
        return -jnp.mean(jnp.sum(rews, axis=0)), state

    key = jax.random.PRNGKey(1)
    actions = jax.random.uniform(
        key, (H, env.num_envs, env.num_acts), minval=-0.5, maxval=0.5
    )

    fwd = jax.jit(window_loss)
    grad = jax.jit(jax.grad(window_loss, has_aux=True))

    # --- forward ---
    (loss, st) = fwd(actions, state0)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        loss, st = fwd(actions, state0)
    jax.block_until_ready(loss)
    t_fwd = (time.perf_counter() - t0) / reps
    fwd_sps = H * env.num_envs / t_fwd
    print(f"forward: {t_fwd*1e3:.1f} ms/window  {fwd_sps:,.0f} env-steps/s")

    # --- grad ---
    g, st = grad(actions, state0)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g, st = grad(actions, state0)
    jax.block_until_ready(g)
    t_grad = (time.perf_counter() - t0) / reps
    grad_sps = H * env.num_envs / t_grad
    print(
        f"grad:    {t_grad*1e3:.1f} ms/window  {grad_sps:,.0f} env-steps/s"
        f"  ratio {t_grad/t_fwd:.2f}x"
    )

    if args.trace:
        with trace("/tmp/diffrl_trace_fwd"):
            loss, st = fwd(actions, state0)
            jax.block_until_ready(loss)
        print("\n=== forward top ops ===")
        summarize_trace("/tmp/diffrl_trace_fwd", top=30)

        with trace("/tmp/diffrl_trace_bwd"):
            g, st = grad(actions, state0)
            jax.block_until_ready(g)
        print("\n=== grad top ops ===")
        summarize_trace("/tmp/diffrl_trace_bwd", top=40)


if __name__ == "__main__":
    main()
