"""Integrator classes — API parity with the reference's integrator objects.

The reference exposes ``SemiImplicitIntegrator.forward(model, state, dt,
substeps, mass_matrix_freq)`` (/root/reference/dflex/dflex/sim.py:2182-2221)
and ``XPBDIntegrator.forward(model, state, dt)`` (sim.py:2901-2933) as
autograd-taped operations. Here they are thin wrappers over the pure
``simulate``/``simulate_xpbd`` functions: a "step" is just a differentiable
jittable function, no tape or graph node is involved.
"""

from __future__ import annotations

from .articulation import simulate, simulate_xpbd
from .model import Model, State


class SemiImplicitIntegrator:
    """Semi-implicit (symplectic) Euler over articulations + particles."""

    def forward(self, model: Model, state: State, dt: float,
                substeps: int = 1, mass_matrix_freq: int = 1,
                joint_act=None, muscle_act=None) -> State:
        return simulate(
            model, state,
            joint_act=joint_act, muscle_act=muscle_act,
            dt=dt, substeps=substeps, mass_matrix_freq=mass_matrix_freq,
        )


class XPBDIntegrator:
    """Position-based dynamics (particles only, like the reference)."""

    def forward(self, model: Model, state: State, dt: float,
                substeps: int = 1) -> State:
        return simulate_xpbd(model, state, dt=dt, substeps=substeps)
