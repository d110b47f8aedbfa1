"""Wall-clock per-phase breakdown of the real SHAC.train() loop.

Wraps the exact call sites the per-epoch loop hits — the jitted epoch
dispatch, the blocking jax.device_get, _log_scalars (TB + npz), and
console printing — with perf_counter accumulators, then runs train() for
--epochs epochs on hardware. Unlike cProfile (tools/profile_train_host.py)
this is thread-safe and attributes async-dispatch wall time correctly:
the device compute shows up inside device_get.

Usage: python tools/profile_train_phases.py [--envs 4096] [--epochs 25]
"""

import argparse
import builtins
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        os.path.dirname(__file__), "..", "examples", "cfg", "shac", "ant.yaml"))
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=25)
    args = ap.parse_args()

    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)
    cfg["params"]["config"]["num_actors"] = args.envs
    cfg["params"]["config"]["max_epochs"] = args.epochs
    cfg["params"]["config"]["save_interval"] = 0
    cfg["params"]["general"] = {"logdir": "/tmp/profile_train_phases", "seed": 0}

    import jax
    from diffrl_tpu.algorithms import shac as shac_mod

    tr = shac_mod.SHAC(cfg)
    k = jax.random.PRNGKey(123)
    out = tr._train_epoch(
        tr.actor_params, tr.actor_opt_state, tr.critic_params,
        tr.critic_opt_state, tr.target_critic_params, tr.env_state,
        tr.obs_rms, tr.ret_rms, tr.episode_trackers, k)
    jax.block_until_ready(out)

    acc = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
            return r
        return wrap

    tr._train_epoch = timed("dispatch", tr._train_epoch)
    tr._log_scalars = timed("log_scalars", tr._log_scalars)
    # NOTE: shac_mod.np/jax ARE the shared numpy/jax modules — patching
    # their attributes is global. Save the originals and restore in a
    # finally block (a bare `del` would REMOVE np.asarray from numpy).
    orig_device_get = jax.device_get
    orig_asarray = shac_mod.np.asarray
    shac_mod.jax.device_get = timed("device_get", orig_device_get)
    shac_mod.print = timed("print", builtins.print)  # module-level shadow
    shac_mod.np.asarray = timed("np_asarray", orig_asarray)

    t0 = time.perf_counter()
    try:
        tr.train()
    finally:
        total = time.perf_counter() - t0
        shac_mod.jax.device_get = orig_device_get
        shac_mod.np.asarray = orig_asarray
        del shac_mod.print  # removes the shadow; builtins.print unaffected

    n = args.epochs
    print(f"\n=== per-epoch phase breakdown ({n} epochs, {total/n*1e3:.1f} ms/epoch) ===")
    rest = total
    for name, t in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"{name:<14}{t/n*1e3:9.2f} ms/epoch  ({100*t/total:5.1f}%)")
        rest -= t
    print(f"{'other host':<14}{rest/n*1e3:9.2f} ms/epoch  ({100*rest/total:5.1f}%)")
    steps = tr.steps_num * tr.num_envs
    print(f"sustained: {steps * n / total:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
