"""Environment smoke test + fps harness (parity with
/root/reference/examples/test_env.py): N envs x T random-action steps,
prints env-steps/s and `Finish Successfully`."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

import diffrl_tpu.envs as envs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="Ant")
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--render", default=False, action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    env = envs.make(
        args.env,
        num_envs=args.num_envs,
        seed=args.seed,
        stochastic_init=True,
        MM_caching_frequency=env_mm_freq(args.env),
    )

    key = jax.random.PRNGKey(args.seed)
    state = env.reset(key)

    @jax.jit
    def step_fn(state, key):
        key, sub = jax.random.split(key)
        actions = jax.random.uniform(
            sub, (env.num_envs, env.num_acts), minval=-1.0, maxval=1.0
        )
        state, obs, rew, done, _ = env.step(state, actions)
        return state, key, obs, rew, done

    # compile
    t0 = time.time()
    state, key, obs, rew, done = step_fn(state, key)
    jax.block_until_ready(obs)
    print(f"compile: {time.time() - t0:.1f}s")

    renderer = None
    if args.render:
        from diffrl_tpu.render import UsdRenderer
        from diffrl_tpu.sim import State

        renderer = UsdRenderer(env.model, f"outputs/{args.env}.usda",
                               fps=1.0 / env.dt)

    t0 = time.time()
    for i in range(args.steps - 1):
        state, key, obs, rew, done = step_fn(state, key)
        if renderer is not None and i % 2 == 0:
            renderer.update(
                State(joint_q=state.joint_q[0], joint_qd=state.joint_qd[0]),
                (i + 1) * env.dt,
            )
    jax.block_until_ready(obs)
    elapsed = time.time() - t0

    if renderer is not None:
        print("wrote", renderer.save())

    assert bool(jnp.all(jnp.isfinite(obs))), "non-finite observations"
    fps = (args.steps - 1) * args.num_envs / elapsed
    print(f"fps = {fps:.0f} ({args.num_envs} envs, {args.steps} steps, {elapsed:.2f}s)")
    print("Finish Successfully")


def env_mm_freq(name: str) -> int:
    # per-env MM_caching_frequency defaults from examples/cfg/shac/*.yaml
    return {
        "CartPoleSwingUp": 4,
        "Ant": 16,
        "Hopper": 16,
        "Cheetah": 16,
        "Humanoid": 48,
        "SNUHumanoid": 8,
    }.get(name, 1)


if __name__ == "__main__":
    main()
