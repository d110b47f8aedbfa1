"""Generate the fixed-seed regression fixture for the coupled
particle + articulation scene (tests/test_coupled.py).

The coupled path deliberately deviates from the reference (soft contacts
see the CURRENT substep's body transforms, see sim/articulation.py:
coupled_substep docstring), so this is a self-regression fixture pinning
today's behavior, not a reference-parity fixture.

Usage: python tools/gen_coupled_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from test_coupled import rollout_coupled  # noqa: E402


def main():
    traj = rollout_coupled()
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "coupled_regression.npz",
    )
    np.savez(out, **{k: np.asarray(v) for k, v in traj.items()})
    print(f"wrote {out}:")
    for k, v in traj.items():
        print(f"  {k}: {np.asarray(v).shape}")


if __name__ == "__main__":
    main()
