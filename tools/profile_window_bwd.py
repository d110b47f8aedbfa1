"""Device-trace the N-step window gradient (manual or remat backward) and
summarize where the time goes. Companion to tools/bench_backward.py.

Usage: python tools/profile_window_bwd.py [--mode manual] [--envs 4096]
       [--steps 8] [--unroll 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import diffrl_tpu.envs as envs
from diffrl_tpu.sim import simulate
from diffrl_tpu.sim.model import State
from diffrl_tpu.utils.profiling import summarize_trace, trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="manual")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--substeps", type=int, default=16)
    ap.add_argument("--mm", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    env = envs.make("Ant", num_envs=args.envs, seed=0, stochastic_init=True,
                    episode_length=1000, MM_caching_frequency=args.mm)
    es = env.reset(jax.random.PRNGKey(0))
    model = env.model
    acts = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (args.steps, args.envs, model.dof_count))

    def window(q, qd, acts):
        def step(c, a):
            q, qd = c
            s = jax.vmap(
                lambda q1, qd1, a1: simulate(
                    model, State(joint_q=q1, joint_qd=qd1), joint_act=a1,
                    dt=env.dt, substeps=args.substeps,
                    mass_matrix_freq=args.mm, backward=args.mode,
                    backward_unroll=args.unroll,
                )
            )(q, qd, a)
            return (s.joint_q, s.joint_qd), None

        (q, qd), _ = lax.scan(step, (q, qd), acts)
        w = jnp.cos(jnp.arange(q.shape[-1], dtype=jnp.float32))
        return jnp.sum(q * w) + 0.5 * jnp.sum(qd ** 2)

    bwd = jax.jit(jax.grad(window, argnums=(0, 1, 2)))
    jax.block_until_ready(bwd(es.joint_q, es.joint_qd, acts))

    import time
    t0 = time.perf_counter()
    for _ in range(5):
        out = bwd(es.joint_q, es.joint_qd, acts)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 5 * 1e3
    n = args.steps * args.envs
    print(f"[{args.mode} unroll={args.unroll}] grad {ms:.2f} ms  "
          f"grad-pass env-steps/s {n / (ms / 1e3):,.0f}")

    tdir = f"/tmp/trace_window_{args.mode}_u{args.unroll}"
    with trace(tdir):
        jax.block_until_ready(bwd(es.joint_q, es.joint_qd, acts))
    summarize_trace(tdir, top=args.top)


if __name__ == "__main__":
    main()
