"""Render SHAC training curves (docs/results/*.npz) to one small-multiples
figure — the analog of the reference's figures/training_comparison.jpg.

Each panel is a single series (episode reward vs epoch), so identity is
carried by the panel title, not color; one hue across panels, recessive
grid, direct end-value label.

Usage: python tools/plot_training_curves.py [--out docs/results/training_curves.png]
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(HERE, "docs", "results")

# (npz file, panel title, scalar key)
PANELS = [
    ("shac_ant_seed0_2000ep.npz", "Ant", "rewards"),
    ("shac_cheetah_seed0_2000ep.npz", "Cheetah", "rewards"),
    ("shac_hopper_seed0_2000ep.npz", "Hopper", "rewards"),
    ("shac_humanoid_seed0_2000ep.npz", "Humanoid", "rewards"),
    ("shac_snu_seed0_2000ep.npz", "SNU Humanoid (152 muscles)", "rewards"),
    ("shac_cartpole_seed42.npz", "CartPoleSwingUp (neg. loss)", "rewards"),
]

# BASELINE-scale runs (1024-4096 envs, lb backward + pipelined loop)
PANELS_SCALE = [
    ("ant4096_r4_pipelined_shac_seed0.npz", "Ant 4096 envs (401k steps/s)",
     "rewards"),
    ("humanoid1024_r5_lb_shac_seed0.npz",
     "Humanoid 1024 envs (35k steps/s)", "rewards"),
    ("snu1024_r5_lb_shac_seed0.npz",
     "SNU Humanoid 1024 envs (20k steps/s)", "rewards"),
]

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
SERIES = "#2a78d6"
GRID = "#e6e5e2"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(RESULTS, "training_curves.png"))
    ap.add_argument("--scale", action="store_true",
                    help="plot the BASELINE-scale panel set instead")
    args = ap.parse_args()

    src = PANELS_SCALE if args.scale else PANELS
    panels = [(f, t, k) for f, t, k in src
              if os.path.exists(os.path.join(RESULTS, f))]
    n = len(panels)
    ncols = 3
    nrows = (n + ncols - 1) // ncols

    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4.2 * ncols, 3.0 * nrows), facecolor=SURFACE
    )
    axes = np.atleast_1d(axes).ravel()

    for ax, (fname, title, key) in zip(axes, panels):
        d = np.load(os.path.join(RESULTS, fname))
        if key not in d:
            key = list(d.keys())[0]
        arr = np.asarray(d[key])  # (N, 3): iter, step, value
        it, val = arr[:, 0], arr[:, 2]
        ok = np.isfinite(val)
        it, val = it[ok], val[ok]
        if it.size == 0:
            ax.set_visible(False)
            continue

        ax.set_facecolor(SURFACE)
        ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
        ax.plot(it, val, color=SERIES, linewidth=2.0, zorder=3,
                solid_capstyle="round")
        # direct end-value label (selective labeling, text in ink not hue)
        ax.annotate(
            f"{val[-1]:,.0f}", (it[-1], val[-1]),
            xytext=(-4, 8), textcoords="offset points",
            ha="right", fontsize=10, color=INK, fontweight="bold",
        )
        ax.set_title(title, fontsize=12, color=INK, loc="left", pad=8)
        ax.tick_params(colors=INK2, labelsize=9)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.set_xlabel("epoch", fontsize=9, color=INK2)

    for ax in axes[n:]:
        ax.set_visible(False)

    fig.suptitle(
        "SHAC training reward — diffrl_tpu, one TPU chip, "
        + ("BASELINE-scale configs" if args.scale
           else "reference paper configs"),
        fontsize=13, color=INK, x=0.01, ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(args.out, dpi=150, facecolor=SURFACE)
    print(f"wrote {args.out} ({n} panels)")


if __name__ == "__main__":
    main()
