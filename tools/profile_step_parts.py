"""Microbenchmark the parts of one Ant env step at 4096 envs.

Isolates:  (a) a mass-cache substep, (b) the refresh substep (H refactorize),
(c) the full 16-substep sim, (d) obs+reward+reset env glue — to show where
the per-step time goes (the inner substep while-loop is NOT the bottleneck;
see docs/PERF_NOTES.md).

Usage: python tools/profile_step_parts.py [--envs 4096]
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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    args = ap.parse_args()

    env = envs.make(
        "Ant", num_envs=args.envs, seed=0, stochastic_init=True,
        episode_length=1000, MM_caching_frequency=16,
    )
    es = env.reset(jax.random.PRNGKey(0))
    model = env.model
    h = env.dt / env.sim_substeps
    ja = jnp.zeros((args.envs, model.dof_count))

    def refresh(q, qd, a):
        s, HL = jax.vmap(
            lambda q1, qd1, a1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h
            )
        )(q, qd, a)
        return s.joint_q, s.joint_qd, HL

    refresh_j = jax.jit(refresh)
    q, qd, HL = refresh_j(es.joint_q, es.joint_qd, ja)

    def cached(q, qd, a, HL):
        s, _ = jax.vmap(
            lambda q1, qd1, a1, H1, L1: coupled_substep(
                model, State(joint_q=q1, joint_qd=qd1), a1, None, h,
                mass_cache=(H1, L1),
            )
        )(q, qd, a, HL[0], HL[1])
        return s.joint_q, s.joint_qd

    cached_j = jax.jit(cached)

    def full_step(state, actions):
        state, obs, rew, done, _ = env.step(state, actions)
        return state, rew

    step_j = jax.jit(full_step)
    acts = jnp.zeros((args.envs, env.num_acts))

    t_refresh = timeit(refresh_j, es.joint_q, es.joint_qd, ja)
    t_cached = timeit(cached_j, es.joint_q, es.joint_qd, ja, HL)
    t_step = timeit(step_j, es, acts)

    print(f"refresh substep (H refactorize): {t_refresh:7.3f} ms")
    print(f"cached substep:                  {t_cached:7.3f} ms")
    print(f"full env step (16 substeps):     {t_step:7.3f} ms")
    print(f"  -> 15 cached substeps predict  {15*t_cached:7.3f} ms")
    print(f"  -> env glue (obs/rew/reset) ~  {t_step - t_refresh - 15*t_cached:7.3f} ms")


if __name__ == "__main__":
    main()
