"""Average multi-seed TensorBoard logs into one event file (parity with
/root/reference/examples/combine_batch_logs.py): reads the per-seed event
files under <dpath>/<seed>/log, aligns tags on the union of steps with
nearest-carried-forward interpolation, and writes the per-step mean."""

import argparse
import os
from collections import defaultdict

import numpy as np

TAG_MAPPING = {
    "rewards/step": "rewards/step",
    "rewards/iter": "rewards/iter",
    "rewards/time": "rewards/time",
    "policy_loss/step": "policy_loss/step",
    "policy_loss/iter": "policy_loss/iter",
    "policy_loss/time": "policy_loss/time",
    "actor_loss/iter": "actor_loss/iter",
    "actor_loss/step": "actor_loss/step",
    "best_policy_loss/step": "best_policy_loss/step",
    "episode_lengths/iter": "episode_lengths/iter",
    "episode_lengths/step": "episode_lengths/step",
    "value_loss/step": "value_loss/step",
    "value_loss/iter": "value_loss/iter",
}


def tabulate_events(dpath, subfolder_names):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    iters = []
    for dname in sorted(os.listdir(dpath)):
        for sub in subfolder_names:
            p = os.path.join(dpath, dname, sub)
            if os.path.exists(p):
                iters.append(EventAccumulator(p).Reload())
                break
    if not iters:
        raise FileNotFoundError(f"no event folders under {dpath}")

    out_steps, out_values = {}, {}
    tags = iters[0].Tags()["scalars"]
    for tag in tags:
        if tag not in TAG_MAPPING:
            continue
        steps = sorted({e.step for it in iters for e in it.Scalars(tag)})
        per_run = []
        for it in iters:
            ev = it.Scalars(tag)
            xs = np.array([e.step for e in ev])
            ys = np.array([e.value for e in ev])
            # carry the last seen value forward onto the union grid
            idx = np.clip(np.searchsorted(xs, steps, side="right") - 1, 0, None)
            per_run.append(ys[idx])
        out_steps[TAG_MAPPING[tag]] = steps
        out_values[TAG_MAPPING[tag]] = np.mean(np.stack(per_run), axis=0)
    return out_steps, out_values


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-folder", type=str, required=True,
                        help="folder containing one run folder per seed")
    parser.add_argument("--output-folder", type=str, required=True)
    parser.add_argument("--subfolder-names", nargs="+", default=["log"])
    args = parser.parse_args()

    from tensorboardX import SummaryWriter

    steps, values = tabulate_events(args.batch_folder, args.subfolder_names)
    os.makedirs(args.output_folder, exist_ok=True)
    writer = SummaryWriter(args.output_folder)
    for tag in steps:
        for s, v in zip(steps[tag], values[tag]):
            writer.add_scalar(tag, float(v), int(s))
    writer.flush()
    writer.close()
    print(f"wrote averaged logs for {len(steps)} tags to {args.output_folder}")


if __name__ == "__main__":
    main()
