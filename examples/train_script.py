"""Multi-seed training sweeps (parity with
/root/reference/examples/train_script.py): builds and runs one training
command per seed for a chosen env/algorithm."""

import argparse
import os
import subprocess
import sys

CONFIGS = {
    "Ant": "ant.yaml",
    "CartPole": "cartpole_swing_up.yaml",
    "Hopper": "hopper.yaml",
    "Cheetah": "cheetah.yaml",
    "Humanoid": "humanoid.yaml",
    "SNUHumanoid": "snu_humanoid.yaml",
}

SCRIPTS = {
    "shac": "train_shac.py",
    "bptt": "train_bptt.py",
    "ppo": "train_rl.py",
    "sac": "train_rl.py",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="Ant", choices=sorted(CONFIGS))
    parser.add_argument("--algo", type=str, default="shac", choices=sorted(SCRIPTS))
    parser.add_argument("--num-seeds", type=int, default=5)
    parser.add_argument("--save-dir", type=str, default="./logs/")
    args = parser.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    seeds = [i * 10 for i in range(args.num_seeds)]

    for seed in seeds:
        save_dir = os.path.join(args.save_dir, args.env, args.algo, str(seed))
        cfg = os.path.join(here, "cfg", args.algo, CONFIGS[args.env])
        cmd = [
            sys.executable, os.path.join(here, SCRIPTS[args.algo]),
            "--cfg", cfg, "--seed", str(seed),
            "--logdir", save_dir, "--no-time-stamp",
        ]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
