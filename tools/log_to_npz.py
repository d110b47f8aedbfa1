"""Convert a train_shac/train_bptt stdout log into a docs/results npz.

Each scalar is stored as an (N, 3) array of (iter, env_steps, value) rows,
matching the existing docs/results/*.npz convention.

Usage: python tools/log_to_npz.py LOGFILE OUT.npz --steps-per-iter 2048
"""

import argparse
import re

import numpy as np

LINE = re.compile(
    r"iter (\d+): ep loss ([-\d.infa]+), ep discounted loss ([-\d.infa]+), "
    r"ep len ([-\d.]+), fps total ([-\d.]+)(?:, value loss ([-\d.]+))?"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile")
    ap.add_argument("out")
    ap.add_argument("--steps-per-iter", type=int, required=True)
    args = ap.parse_args()

    rows = {"rewards": [], "episode_lengths": [], "fps": [], "value_loss": [],
            "policy_loss": []}
    for line in open(args.logfile):
        m = LINE.search(line)
        if not m:
            continue
        it = int(m.group(1))
        step = it * args.steps_per_iter
        try:
            loss = float(m.group(2))
        except ValueError:
            continue
        rows["policy_loss"].append((it, step, loss))
        rows["rewards"].append((it, step, -loss))
        rows["episode_lengths"].append((it, step, float(m.group(4))))
        rows["fps"].append((it, step, float(m.group(5))))
        if m.group(6) is not None:
            rows["value_loss"].append((it, step, float(m.group(6))))

    out = {k: np.asarray(v, dtype=np.float64) for k, v in rows.items() if v}
    np.savez(args.out, **out)
    for k, v in out.items():
        print(f"{k}: {v.shape[0]} rows, final value {v[-1, 2]:.2f}")


if __name__ == "__main__":
    main()
