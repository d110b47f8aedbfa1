"""Microbenchmark: forward vs gradient of ONE Ant substep at 4096 envs.

The reverse region of a per-substep checkpoint runs ~9x the forward substep
(docs/PERF_NOTES.md); this isolates a single substep's VJP so fusion
behavior can be iterated on with fast compiles.

Usage: python tools/profile_substep_grad.py [--envs 4096] [--trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import diffrl_tpu.envs as envs
from diffrl_tpu.sim.articulation import coupled_substep
from diffrl_tpu.sim.model import State
from diffrl_tpu.utils.profiling import summarize_trace, trace


def timeit(fn, *args, reps=50):
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
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    env = envs.make(
        "Ant", num_envs=args.envs, seed=0, stochastic_init=True,
        episode_length=1000, MM_caching_frequency=16,
    )
    es = env.reset(jax.random.PRNGKey(0))
    model = env.model
    h = env.dt / env.sim_substeps
    ja = jnp.zeros((args.envs, model.dof_count))

    # build a mass cache once (cached-substep path, the common case: 15/16)
    def refresh(q, qd, a):
        s, HL = jax.vmap(
            lambda q1, qd1, a1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h
            )
        )(q, qd, a)
        return HL

    HL = jax.jit(refresh)(es.joint_q, es.joint_qd, ja)
    HL = jax.lax.stop_gradient(HL)

    def loss(q, qd, a):
        s, _ = jax.vmap(
            lambda q1, qd1, a1, H1, L1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h,
                mass_cache=(H1, L1),
            )
        )(q, qd, a, HL[0], HL[1])
        return jnp.sum(s.joint_q) + jnp.sum(s.joint_qd)

    fwd = jax.jit(loss)
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    # chain of N substeps under different loop/remat structures
    def body(c, _):
        s, _ = jax.vmap(
            lambda q1, qd1, a1, H1, L1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h,
                mass_cache=(H1, L1),
            )
        )(c[0], c[1], c[2], HL[0], HL[1])
        return (s.joint_q, s.joint_qd, c[2]), None

    N = 8

    def mk_loss(scan_body, unroll=1, use_scan=True):
        def loss_n(q, qd, a):
            c = (q, qd, a)
            if use_scan:
                c, _ = jax.lax.scan(scan_body, c, None, length=N, unroll=unroll)
            else:
                for _ in range(N):
                    c, _ = scan_body(c, None)
            return jnp.sum(c[0]) + jnp.sum(c[1])
        return loss_n

    ckpt_body = jax.checkpoint(body, prevent_cse=False)

    # diagnostic: how much of the backward is the mass-cache (H, Hinv)
    # cotangent (outer-product materialization in solve_frozen_inv's VJP
    # per cached substep)? stop_gradient'ing the cache removes exactly that.
    def body_nohgrad(c, _):
        HLs = jax.lax.stop_gradient(HL)
        s, _ = jax.vmap(
            lambda q1, qd1, a1, H1, L1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h,
                mass_cache=(H1, L1),
            )
        )(c[0], c[1], c[2], HLs[0], HLs[1])
        return (s.joint_q, s.joint_qd, c[2]), None

    ckpt_body_nohgrad = jax.checkpoint(body_nohgrad, prevent_cse=False)

    variants = {
        "scan plain": mk_loss(body),
        "scan ckpt": mk_loss(ckpt_body),
        "scan ckpt noHgrad": mk_loss(ckpt_body_nohgrad),
        "scan ckpt unroll4": mk_loss(ckpt_body, unroll=4),
        "unrolled plain": mk_loss(body, use_scan=False),
        "unrolled ckpt": mk_loss(ckpt_body, use_scan=False),
    }

    t_f = timeit(fwd, es.joint_q, es.joint_qd, ja)
    t_b = timeit(bwd, es.joint_q, es.joint_qd, ja)
    print(f"substep forward:        {t_f:7.3f} ms")
    print(f"substep grad:           {t_b:7.3f} ms   ratio {t_b/t_f:.2f}x")
    for name, ln in variants.items():
        g = jax.jit(jax.grad(ln, argnums=(0, 1, 2)))
        t = timeit(g, es.joint_q, es.joint_qd, ja, reps=10)
        print(f"{name:20s} grad: {t:7.3f} ms   per-substep {t/N:.3f} ms")

    if args.trace:
        with trace("/tmp/trace_substep_fwd"):
            jax.block_until_ready(fwd(es.joint_q, es.joint_qd, ja))
        print("\n=== substep forward ===")
        summarize_trace("/tmp/trace_substep_fwd", top=15)
        with trace("/tmp/trace_substep_bwd"):
            jax.block_until_ready(bwd(es.joint_q, es.joint_qd, ja))
        print("\n=== substep grad ===")
        summarize_trace("/tmp/trace_substep_bwd", top=25)


if __name__ == "__main__":
    main()
