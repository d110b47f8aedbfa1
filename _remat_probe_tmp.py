import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

import diffrl_tpu.envs as envs
from diffrl_tpu.sim import State
from diffrl_tpu.sim.articulation import coupled_substep

env = envs.make("Ant", num_envs=8, seed=0)
model = env.model
E = 4096
D = model.dof_count
q0 = jnp.tile(model.joint_q_init, (E, 1))
qd0 = jnp.zeros((E, D))
ja = jnp.zeros((E, D))
h = (1.0 / 60.0) / 16


def make_loss(remat_mode):
    def window(q, qd, ja):
        def one_env(q, qd, ja):
            def block(s, _):
                s, HL = coupled_substep(model, s, ja, None, h)

                def inner(c, _):
                    si, _ = coupled_substep(model, c, ja, None, h, mass_cache=HL)
                    return si, None

                s, _ = lax.scan(inner, s, None, length=15)
                return s, None

            if remat_mode == "block":
                b = jax.checkpoint(block)
            elif remat_mode == "none":
                b = block
            elif remat_mode == "dots":
                b = jax.checkpoint(
                    block, policy=jax.checkpoint_policies.dots_saveable
                )

            def step(s, _):
                s, _ = b(s, None)
                return s, None

            s0 = State(joint_q=q, joint_qd=qd)
            s, _ = lax.scan(step, s0, None, length=32)
            return jnp.sum(s.joint_q)

        return jnp.sum(jax.vmap(one_env)(q, qd, ja))

    return jax.jit(jax.grad(window))


for mode in sys.argv[1:]:
    try:
        g = make_loss(mode)
        t0 = time.time()
        r = g(q0, qd0, ja)
        jax.block_until_ready(r)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(2):
            r = g(q0, qd0, ja)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 2
        print(f"{mode}: {dt:.3f}s = {E*32/dt:.0f} steps/s (compile {tc:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
