"""Window-gradient benchmark: remat vs manual (hand-written) simulate VJP.

Measures forward and gradient wall-clock of an N-step Ant window at E envs
(the SHAC actor-loss shape: scan of env-steps, each 16 substeps with
mass_matrix_freq=16), for ``backward='remat'`` (autodiff through the substep
scan with per-substep jax.checkpoint — the round-1 optimum, 0.95 ms/substep
backward) and ``backward='manual'`` (flat hand-written reverse scan,
sim/articulation.py:_simulate_manual).

Also cross-checks that both modes produce identical gradients at full batch
before timing. Prints ms per call and env-steps/s.

Usage: python tools/bench_backward.py [--envs 4096] [--steps 8] [--substeps 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import diffrl_tpu.envs as envs
from diffrl_tpu.sim import simulate
from diffrl_tpu.sim.model import State


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--substeps", type=int, default=16)
    ap.add_argument("--mm", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--modes", default="remat,manual",
                    help="comma list of remat,manual,pallas,lb")
    args = ap.parse_args()

    env = envs.make("Ant", num_envs=args.envs, seed=0, stochastic_init=True,
                    episode_length=1000, MM_caching_frequency=args.mm)
    es = env.reset(jax.random.PRNGKey(0))
    model = env.model
    E, N = args.envs, args.steps
    acts = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (N, E, model.dof_count))

    def make_window(backward):
        if backward in ("pallas", "lb", "lb_ad"):
            if backward == "pallas":
                from diffrl_tpu.sim.articulation import (
                    simulate_batched_pallas as sim_batched)
            else:
                from diffrl_tpu.sim.articulation_lb import (
                    simulate_batched_lb as _lb)
                from functools import partial
                sim_batched = partial(
                    _lb, reverse="residual" if backward == "lb_ad"
                    else "replay")

            def window(q, qd, acts):
                def step(c, a):
                    q, qd = c
                    q, qd = sim_batched(
                        model, q, qd, a, None, dt=env.dt,
                        substeps=args.substeps, mass_matrix_freq=args.mm,
                    )
                    return (q, qd), None

                (q, qd), _ = lax.scan(step, (q, qd), acts)
                w = jnp.cos(jnp.arange(q.shape[-1], dtype=jnp.float32))
                return jnp.sum(q * w) + 0.5 * jnp.sum(qd ** 2) / E
            return window

        def window(q, qd, acts):
            def step(c, a):
                q, qd = c
                s = jax.vmap(
                    lambda q1, qd1, a1: simulate(
                        model, State(joint_q=q1, joint_qd=qd1), joint_act=a1,
                        dt=env.dt, substeps=args.substeps,
                        mass_matrix_freq=args.mm, backward=backward,
                    )
                )(q, qd, a)
                return (s.joint_q, s.joint_qd), None

            (q, qd), _ = lax.scan(step, (q, qd), acts)
            w = jnp.cos(jnp.arange(q.shape[-1], dtype=jnp.float32))
            return jnp.sum(q * w) + 0.5 * jnp.sum(qd ** 2) / E
        return window

    results = {}
    grads = {}
    modes = tuple(args.modes.split(","))
    for mode in modes:
        win = make_window(mode)
        fwd = jax.jit(win)
        bwd = jax.jit(jax.grad(win, argnums=(0, 1, 2)))
        t_compile0 = time.perf_counter()
        jax.block_until_ready(bwd(es.joint_q, es.joint_qd, acts))
        t_compile = time.perf_counter() - t_compile0
        t_f = timeit(fwd, es.joint_q, es.joint_qd, acts, reps=args.reps)
        t_b = timeit(bwd, es.joint_q, es.joint_qd, acts, reps=args.reps)
        grads[mode] = jax.device_get(bwd(es.joint_q, es.joint_qd, acts))
        env_steps = N * E
        results[mode] = (t_f, t_b, t_compile)
        print(f"[{mode:6s}] fwd {t_f:8.2f} ms  grad {t_b:8.2f} ms "
              f"(ratio {t_b / t_f:4.2f}x)  "
              f"grad-pass env-steps/s {env_steps / (t_b / 1e3):,.0f}  "
              f"first-call (trace+compile+run) {t_compile:6.1f} s")

    base = modes[0]
    for other in modes[1:]:
        for a, b in zip(grads[base], grads[other]):
            err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
            print(f"grad rel err {other} vs {base}: {err:.2e}")
            assert err < 1e-3, "gradient mismatch between backward modes"
        print(f"{other} speedup on grad pass vs {base}: "
              f"{results[base][1] / results[other][1]:.2f}x")


if __name__ == "__main__":
    main()
