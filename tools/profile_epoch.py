"""Profile the jitted SHAC epoch component-by-component on the device.

Round-4 context (docs/PERF_NOTES.md): the link-batched backward runs the
window grad pass at 472k env-steps/s but sustained training is 247k — the
gap is now everything AROUND the simulator gradient. This tool times each
stage of `SHAC._train_epoch` as its own jitted call, plus the fused epoch
and the per-epoch host sync, so optimization targets measurements instead
of guesses (mirrors the reference's wall-clock time_report breakdown,
/root/reference/utils/time_report.py:36-78, at finer grain).

Usage: python tools/profile_epoch.py [--envs 4096] [--reps 20] [--cfg ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import yaml


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        os.path.dirname(__file__), "..", "examples", "cfg", "shac", "ant.yaml"))
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--backward", default=None,
                    help="sim_backward override (auto/lb/manual/remat)")
    args = ap.parse_args()

    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)
    cfg["params"]["config"]["num_actors"] = args.envs
    cfg["params"]["general"] = {"logdir": "/tmp/profile_epoch", "seed": 0}
    if args.backward:
        cfg["params"]["diff_env"]["sim_backward"] = args.backward

    from diffrl_tpu.algorithms.shac import SHAC

    tr = SHAC(cfg)
    E, H = tr.num_envs, tr.steps_num
    steps = E * H
    key = jax.random.PRNGKey(7)
    key_actor, key_critic, key_epoch = jax.random.split(key, 3)

    print(f"profiling SHAC epoch: {E} envs x {H} steps "
          f"({steps} env-steps/epoch) on {jax.devices()[0].platform}")

    # ---- stage 1: actor update (rollout fwd + sim backward + Adam)
    t_actor, actor_out = timeit(
        tr._actor_update, tr.actor_params, tr.actor_opt_state,
        tr.target_critic_params, tr.env_state, tr.obs_rms, tr.ret_rms,
        tr.episode_trackers, key_actor, reps=args.reps)
    aux = actor_out[3]
    outs = aux["outs"]

    # ---- stage 2: TD(lambda) targets
    done_mask = outs["done"].astype(jnp.float32).at[-1].set(1.0)
    t_tgt, targets = timeit(
        tr._compute_target_values, outs["rew"], done_mask,
        outs["next_value"], reps=args.reps)

    # ---- stage 3: critic minibatch iterations
    obs_flat = outs["obs"].reshape(-1, tr.num_obs)
    tgt_flat = targets.reshape(-1)
    t_critic, critic_out = timeit(
        tr._critic_update, tr.critic_params, tr.critic_opt_state,
        obs_flat, tgt_flat, key_critic, reps=args.reps)

    # ---- stage 4: polyak
    t_polyak, _ = timeit(tr._polyak, tr.target_critic_params,
                         critic_out[0], reps=args.reps)

    # ---- fused epoch (what train() actually dispatches)
    def epoch(k):
        return tr._train_epoch(
            tr.actor_params, tr.actor_opt_state, tr.critic_params,
            tr.critic_opt_state, tr.target_critic_params, tr.env_state,
            tr.obs_rms, tr.ret_rms, tr.episode_trackers, k)
    t_epoch, epoch_out = timeit(epoch, key_epoch, reps=args.reps)

    # ---- host sync cost (the per-epoch jax.device_get of stats)
    stats = epoch_out[-1]
    jax.block_until_ready(stats)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        jax.device_get(stats)
    t_sync = (time.perf_counter() - t0) / args.reps * 1e3

    parts = t_actor + t_tgt + t_critic + t_polyak
    print(f"\n{'stage':<28}{'ms':>9}  {'% of fused epoch':>16}")
    for name, t in [
        ("actor_update (sim fwd+bwd)", t_actor),
        ("compute_target_values", t_tgt),
        ("critic_update (16x4 steps)", t_critic),
        ("polyak", t_polyak),
        ("-- sum of stages", parts),
        ("fused train_epoch", t_epoch),
        ("host device_get(stats)", t_sync),
    ]:
        print(f"{name:<28}{t:9.2f}  {100.0 * t / t_epoch:15.1f}%")

    total = t_epoch + t_sync
    print(f"\nepoch+sync {total:.1f} ms -> {steps / total * 1e3:,.0f} "
          f"env-steps/s sustained bound")
    print(f"actor-only bound: {steps / t_actor * 1e3:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
