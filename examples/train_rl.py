"""Model-free baseline CLI (PPO/SAC) — parity with
/root/reference/examples/train_rl.py (which drives the vendored rl_games)."""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from diffrl_tpu.algorithms.runner import Runner
from diffrl_tpu.utils.common import get_time_stamp, seeding


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default=os.path.join(
        os.path.dirname(__file__), "cfg/ppo/ant.yaml"))
    parser.add_argument("--play", default=False, action="store_true")
    parser.add_argument("--checkpoint", type=str, default="Base")
    parser.add_argument("--logdir", type=str, default="logs/tmp/rl/")
    parser.add_argument("--no-time-stamp", default=False, action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--render", default=False, action="store_true")
    parser.add_argument("--num-envs", type=int, default=None)
    parser.add_argument("--max-epochs", type=int, default=None)
    return parser.parse_args()


def main():
    args = get_args()

    with open(args.cfg) as f:
        cfg_train = yaml.safe_load(f)

    if args.play:
        cfg_train["params"]["config"]["num_actors"] = (
            cfg_train["params"]["config"].get("player", {}).get("num_actors", 1)
        )

    if not args.no_time_stamp:
        args.logdir = os.path.join(args.logdir, get_time_stamp())

    if args.num_envs is not None:
        cfg_train["params"]["config"]["num_actors"] = args.num_envs
    if args.max_epochs is not None:
        cfg_train["params"]["config"]["max_epochs"] = args.max_epochs

    vargs = vars(args)
    cfg_train["params"]["general"] = dict(vargs)
    cfg_train["params"]["general"]["train"] = not args.play

    seeding(args.seed)

    runner = Runner()
    runner.load(cfg_train)
    if not args.play:
        os.makedirs(args.logdir, exist_ok=True)
        with open(os.path.join(args.logdir, "cfg.yaml"), "w") as f:
            yaml.dump(cfg_train, f)
    runner.run({"train": not args.play})


if __name__ == "__main__":
    main()
