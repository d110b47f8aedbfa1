"""cProfile the real SHAC.train() host loop for a few epochs.

Companion to tools/profile_epoch.py: that tool measures the device-side
stages; this one finds where the REMAINING per-epoch wall-clock goes
(meters, logging, TB writes, dispatch overhead) by profiling the actual
training loop on hardware for --epochs epochs.

Usage: python tools/profile_train_host.py [--envs 4096] [--epochs 25]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys

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
    cfg["params"]["general"] = {"logdir": "/tmp/profile_train_host", "seed": 0}

    from diffrl_tpu.algorithms.shac import SHAC

    tr = SHAC(cfg)
    # warm the compile outside the profile so the numbers are steady-state
    import jax
    k = jax.random.PRNGKey(123)
    out = tr._train_epoch(
        tr.actor_params, tr.actor_opt_state, tr.critic_params,
        tr.critic_opt_state, tr.target_critic_params, tr.env_state,
        tr.obs_rms, tr.ret_rms, tr.episode_trackers, k)
    jax.block_until_ready(out)

    prof = cProfile.Profile()
    prof.enable()
    tr.train()
    prof.disable()

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
