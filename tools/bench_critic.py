"""Benchmark variants of the SHAC critic minibatch loop on the device.

The jitted epoch spends ~55 ms (16%) in critic_update (tools/
profile_epoch.py): 16 iterations x 4 minibatches of Adam MSE steps, each a
~0.86 ms sequential scan iteration whose FLOPs are trivial (32768x37x64
MLP) — so the cost is per-iteration op overhead, not math. This tool
times semantically-equivalent restructurings in isolation to find which
overhead actually pays:

  base      — the current shac.py structure (two gathers, pytree Adam)
  fusedgath — obs+target concatenated once, ONE gather per minibatch
  flatadam  — Adam/global-norm/nan_to_num on ONE raveled [P] vector
              (collapses ~6 ops x 8 pytree leaves to ~6 ops total)
  both      — fusedgath + flatadam

Usage: python tools/bench_critic.py [--n 131072] [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.flatten_util import ravel_pytree

from diffrl_tpu.models import CriticMLP


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--obs", type=int, default=37)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--nb", type=int, default=4)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    n, iters, nb = args.n, args.iters, args.nb
    bs = n // nb
    critic = CriticMLP(args.obs)
    key = jax.random.PRNGKey(0)
    params = critic.init(key)
    opt = optax.adam(2e-3, b1=0.7, b2=0.95)
    opt_state = opt.init(params)
    obs_flat = jax.random.normal(key, (n, args.obs))
    tgt_flat = jax.random.normal(jax.random.PRNGKey(1), (n,))
    grad_norm = 1.0

    def mse(p, o, t, w):
        v = critic(p, o)[..., 0]
        return jnp.sum((v - t) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)

    # ---------------------------------------------------------------- base
    @jax.jit
    def base(params, opt_state, key):
        def one_iter(carry, it_key):
            params, opt_state = carry
            perm = jax.random.permutation(it_key, n)

            def one_batch(carry, b):
                params, opt_state, total = carry
                idx = perm[b * bs + jnp.arange(bs)]
                o = obs_flat[idx]
                t = tgt_flat[idx]
                w = jnp.ones((bs,))
                loss, grads = jax.value_and_grad(mse)(params, o, t, w)
                grads = jax.tree.map(
                    lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
                gn = optax.global_norm(grads)
                scale = jnp.minimum(1.0, grad_norm / (gn + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, total + loss), None

            (params, opt_state, total), _ = lax.scan(
                one_batch, (params, opt_state, 0.0), jnp.arange(nb))
            return (params, opt_state), total / nb

        return lax.scan(one_iter, (params, opt_state),
                        jax.random.split(key, iters))

    # ----------------------------------------------------------- fusedgath
    data = jnp.concatenate([obs_flat, tgt_flat[:, None]], axis=1)

    @jax.jit
    def fusedgath(params, opt_state, key):
        def one_iter(carry, it_key):
            params, opt_state = carry
            perm = jax.random.permutation(it_key, n)

            def one_batch(carry, b):
                params, opt_state, total = carry
                d = data[perm[b * bs + jnp.arange(bs)]]
                o, t = d[:, :-1], d[:, -1]
                w = jnp.ones((bs,))
                loss, grads = jax.value_and_grad(mse)(params, o, t, w)
                grads = jax.tree.map(
                    lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
                gn = optax.global_norm(grads)
                scale = jnp.minimum(1.0, grad_norm / (gn + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, total + loss), None

            (params, opt_state, total), _ = lax.scan(
                one_batch, (params, opt_state, 0.0), jnp.arange(nb))
            return (params, opt_state), total / nb

        return lax.scan(one_iter, (params, opt_state),
                        jax.random.split(key, iters))

    # ------------------------------------------------------------ flatadam
    flat0, unravel = ravel_pytree(params)
    fopt_state = opt.init(flat0)

    def make_flat(use_fused_gather):
        @jax.jit
        def flat_update(flat, fopt_state, key):
            def one_iter(carry, it_key):
                flat, fopt_state = carry
                perm = jax.random.permutation(it_key, n)

                def one_batch(carry, b):
                    flat, fopt_state, total = carry
                    if use_fused_gather:
                        d = data[perm[b * bs + jnp.arange(bs)]]
                        o, t = d[:, :-1], d[:, -1]
                    else:
                        idx = perm[b * bs + jnp.arange(bs)]
                        o, t = obs_flat[idx], tgt_flat[idx]
                    w = jnp.ones((bs,))

                    def loss_flat(fl):
                        return mse(unravel(fl), o, t, w)

                    loss, g = jax.value_and_grad(loss_flat)(flat)
                    g = jnp.nan_to_num(g, 0.0, 0.0, 0.0)
                    gn = jnp.linalg.norm(g)
                    g = g * jnp.minimum(1.0, grad_norm / (gn + 1e-12))
                    updates, fopt_state = opt.update(g, fopt_state, flat)
                    flat = optax.apply_updates(flat, updates)
                    return (flat, fopt_state, total + loss), None

                (flat, fopt_state, total), _ = lax.scan(
                    one_batch, (flat, fopt_state, 0.0), jnp.arange(nb))
                return (flat, fopt_state), total / nb

            return lax.scan(one_iter, (flat, fopt_state),
                            jax.random.split(key, iters))
        return flat_update

    # ------------------------------------------------------------ pregather
    # permute the WHOLE dataset once per iteration, then read contiguous
    # dynamic slices per minibatch — identical batches to `both` (slices of
    # one permutation), but 1/4 the gather ops
    @jax.jit
    def pregather(flat, fopt_state, key):
        def one_iter(carry, it_key):
            flat, fopt_state = carry
            shuffled = data[jax.random.permutation(it_key, n)]

            def one_batch(carry, b):
                flat, fopt_state, total = carry
                d = lax.dynamic_slice_in_dim(shuffled, b * bs, bs)
                o, t = d[:, :-1], d[:, -1]
                w = jnp.ones((bs,))

                def loss_flat(fl):
                    return mse(unravel(fl), o, t, w)

                loss, g = jax.value_and_grad(loss_flat)(flat)
                g = jnp.nan_to_num(g, 0.0, 0.0, 0.0)
                gn = jnp.linalg.norm(g)
                g = g * jnp.minimum(1.0, grad_norm / (gn + 1e-12))
                updates, fopt_state = opt.update(g, fopt_state, flat)
                flat = optax.apply_updates(flat, updates)
                return (flat, fopt_state, total + loss), None

            (flat, fopt_state, total), _ = lax.scan(
                one_batch, (flat, fopt_state, 0.0), jnp.arange(nb))
            return (flat, fopt_state), total / nb

        return lax.scan(one_iter, (flat, fopt_state),
                        jax.random.split(key, iters))

    # ------------------------------------------------- pregather_pt
    # pregather's one-shuffle + contiguous slices, but keeping the pytree
    # Adam (no flat-vector opt state — checkpoint format unchanged)
    @jax.jit
    def pregather_pt(params, opt_state, key):
        def one_iter(carry, it_key):
            params, opt_state = carry
            shuffled = data[jax.random.permutation(it_key, n)]

            def one_batch(carry, b):
                params, opt_state, total = carry
                d = lax.dynamic_slice_in_dim(shuffled, b * bs, bs)
                o, t = d[:, :-1], d[:, -1]
                w = jnp.ones((bs,))
                loss, grads = jax.value_and_grad(mse)(params, o, t, w)
                grads = jax.tree.map(
                    lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
                gn = optax.global_norm(grads)
                scale = jnp.minimum(1.0, grad_norm / (gn + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, total + loss), None

            (params, opt_state, total), _ = lax.scan(
                one_batch, (params, opt_state, 0.0), jnp.arange(nb))
            return (params, opt_state), total / nb

        return lax.scan(one_iter, (params, opt_state),
                        jax.random.split(key, iters))

    k = jax.random.PRNGKey(42)
    t_base = timeit(base, params, opt_state, k, reps=args.reps)
    t_pgpt = timeit(pregather_pt, params, opt_state, k, reps=args.reps)
    t_fg = timeit(fusedgath, params, opt_state, k, reps=args.reps)
    t_fa = timeit(make_flat(False), flat0, fopt_state, k, reps=args.reps)
    t_both = timeit(make_flat(True), flat0, fopt_state, k, reps=args.reps)
    t_pg = timeit(pregather, flat0, fopt_state, k, reps=args.reps)

    # numeric cross-check base vs both/pregather (same key -> same perms)
    (p_b, _), _ = base(params, opt_state, k)
    (f_b, _), _ = make_flat(True)(flat0, fopt_state, k)
    (f_p, _), _ = pregather(flat0, fopt_state, k)
    diff = float(jnp.max(jnp.abs(ravel_pytree(p_b)[0] - f_b)))
    diff_p = float(jnp.max(jnp.abs(ravel_pytree(p_b)[0] - f_p)))

    steps = iters * nb
    print(f"{'variant':<12}{'ms total':>10}{'ms/step':>10}")
    for name, t in [("base", t_base), ("fusedgath", t_fg),
                    ("flatadam", t_fa), ("both", t_both),
                    ("pregather", t_pg), ("pregather_pt", t_pgpt)]:
        print(f"{name:<12}{t:10.2f}{t/steps:10.3f}")
    print(f"max |param diff| base vs both after {steps} steps: {diff:.2e}")
    print(f"max |param diff| base vs pregather: {diff_p:.2e}")


if __name__ == "__main__":
    main()


