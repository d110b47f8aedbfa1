"""Quantify trajectory divergence vs the reference engine (env_ant_mjcf).

BASELINE.json's north star says "bit-matched env trajectories under fixed
seed"; f32 contact dynamics are chaotic, so any engine pair (or the same
engine with a 1-ulp state perturbation) diverges exponentially. This tool
makes that argument quantitative for the headline Ant scene:

1. ours vs the recorded reference trajectory (tests/fixtures/env_ant_mjcf),
2. ours vs ours with a 1e-6 initial joint_q perturbation (chaos floor),
3. fitted per-step exponential growth rates for both.

If the engine-vs-reference divergence grows at the same rate as the
self-perturbation divergence, the gap is f32 contact chaos, not model
error. Results recorded in docs/PARITY.md; tolerances in
tests/test_parity.py derive from the measured envelope.

Usage: python tools/parity_divergence.py  (CPU)
"""

import dataclasses
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parity_scenes import ENV_SCENES, _env_builder  # noqa: E402

from diffrl_tpu.sim import simulate  # noqa: E402


def rollout(model, act, state, dt, ss, mm, steps):
    @jax.jit
    def roll(state):
        def body(s, _):
            s2 = simulate(model, s, joint_act=act, dt=dt, substeps=ss,
                          mass_matrix_freq=mm)
            return s2, s2.joint_q
        _, q = jax.lax.scan(body, state, None, length=steps)
        return q

    return np.asarray(roll(state))


def fit_rate(err, lo, hi):
    """Per-step exponential growth rate of max-abs error over steps [lo,hi)."""
    e = np.maximum(err[lo:hi], 1e-12)
    t = np.arange(lo, hi)
    slope = np.polyfit(t, np.log(e), 1)[0]
    return float(slope)


def main():
    scene = ENV_SCENES["env_ant_mjcf"]
    fix = np.load(os.path.join(REPO, "tests", "fixtures", "env_ant_mjcf.npz"))

    b, joint_act = _env_builder(scene["env"])
    model = dataclasses.replace(b.finalize(), ground=scene["ground"])
    act = jnp.asarray(joint_act)
    dt, ss, mm, steps = (scene["dt"], scene["substeps"], scene["mm_freq"],
                         scene["steps"])

    state0 = model.state()
    q_ours = rollout(model, act, state0, dt, ss, mm, steps)

    eps = 1e-6
    state_p = dataclasses.replace(
        state0, joint_q=state0.joint_q.at[7].add(eps)
    )
    q_pert = rollout(model, act, state_p, dt, ss, mm, steps)

    q_ref = fix["joint_q"]
    err_ref = np.max(np.abs(q_ours - q_ref), axis=1)
    err_chaos = np.max(np.abs(q_ours - q_pert), axis=1)

    n = len(err_ref)
    report = {
        "steps": n,
        "err_vs_reference": {
            "step15": float(err_ref[14]),
            "step30": float(err_ref[29]),
            "final": float(err_ref[-1]),
            "max": float(err_ref.max()),
            "rate_per_step": fit_rate(err_ref, 2, n),
        },
        "err_vs_1e-6_self_perturbation": {
            "step15": float(err_chaos[14]),
            "step30": float(err_chaos[29]),
            "final": float(err_chaos[-1]),
            "max": float(err_chaos.max()),
            "rate_per_step": fit_rate(err_chaos, 2, n),
        },
        "per_step_err_vs_reference": [float(x) for x in err_ref],
        "per_step_err_vs_perturbation": [float(x) for x in err_chaos],
    }
    out = os.path.join(REPO, "docs", "results", "parity_divergence.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("per_step")}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
