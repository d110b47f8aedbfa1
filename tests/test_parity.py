"""Trajectory parity against the REFERENCE dflex engine.

Golden fixtures in tests/fixtures/*.npz were produced by running the actual
NVlabs/DiffRL dflex simulator (CPU-compiled kernels) on the scenes defined in
parity_scenes.py (see tools/gen_parity_fixtures.py). These tests rebuild the
same scenes with diffrl_tpu and require the trajectories to agree to float32
round-off — the BASELINE.json "matched env trajectories under fixed seed"
target. Measured deltas at creation time were <= 1e-4 absolute over 90 steps
(contact-rich free-fall box) and <= 1e-6 for smooth articulations.
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from parity_scenes import SCENES  # noqa: E402

from diffrl_tpu.sim import ModelBuilder, simulate  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

# per-scene absolute tolerances (early = first 30 steps, full = all steps)
TOL = {
    "freefall_box": (1e-4, 5e-3),     # ground contacts: stiff penalty forces
    "ball_joint": (1e-5, 1e-4),
    "particle_ground": (1e-5, 1e-4),
    "fem_block": (1e-4, 5e-3),        # FEM tets + ground contact
    "default": (1e-5, 1e-4),
}


def _T(p, q):
    return np.concatenate([np.asarray(p, dtype=float), np.asarray(q, dtype=float)])


@pytest.mark.parametrize("name", sorted(SCENES))
def test_trajectory_parity(name):
    scene = SCENES[name]
    fix_path = os.path.join(FIXTURES, f"{name}.npz")
    fix = np.load(fix_path)

    b = ModelBuilder()
    spec = scene["build"](b, _T)
    repl = dict(ground=scene.get("ground", False))
    repl.update(scene.get("materials", {}))
    model = dataclasses.replace(b.finalize(), **repl)
    muscle_act = (
        jnp.asarray(spec["muscle_activation"], dtype=jnp.float32)
        if spec.get("muscle_activation") else None
    )

    dt = scene.get("dt", 1.0 / 60.0)
    ss = scene.get("substeps", 4)
    mm = scene.get("mm_freq", ss)
    steps = scene.get("steps", 60)

    @jax.jit
    def roll(state):
        def body(s, _):
            s2 = simulate(model, s, joint_act=None, muscle_act=muscle_act,
                          dt=dt, substeps=ss, mass_matrix_freq=mm)
            return s2, (s2.joint_q, s2.joint_qd, s2.particle_q, s2.particle_qd)
        _, out = jax.lax.scan(body, state, None, length=steps)
        return out

    q, qd, pq, pqd = roll(model.state())

    early_tol, full_tol = TOL.get(name, TOL["default"])
    if "joint_q" in fix:
        got = np.asarray(q)
        np.testing.assert_allclose(got[:30], fix["joint_q"][:30], atol=early_tol)
        np.testing.assert_allclose(got, fix["joint_q"], atol=full_tol)
        np.testing.assert_allclose(
            np.asarray(qd), fix["joint_qd"], atol=full_tol * 20
        )
    if "particle_q" in fix:
        got = np.asarray(pq)
        np.testing.assert_allclose(got[:30], fix["particle_q"][:30], atol=early_tol)
        np.testing.assert_allclose(got, fix["particle_q"], atol=full_tol)


@pytest.mark.parametrize("name", sorted(__import__("parity_scenes").ENV_SCENES))
def test_env_model_parity(name):
    """Env-level parity: the MJCF/URDF-imported models stepped with constant
    actuation match the reference engine stepping an identically-constructed
    model (fixture generated via builder replay)."""
    from parity_scenes import ENV_SCENES, _env_builder

    scene = ENV_SCENES[name]
    fix = np.load(os.path.join(FIXTURES, f"{name}.npz"))

    b, joint_act, mus_act = _env_builder(scene["env"])
    model = dataclasses.replace(b.finalize(), ground=scene["ground"])
    act = jnp.asarray(joint_act)
    muscle_act = (
        jnp.asarray(mus_act, dtype=jnp.float32) if mus_act is not None else None
    )

    dt = scene["dt"]
    ss = scene["substeps"]
    mm = scene["mm_freq"]
    steps = scene["steps"]

    @jax.jit
    def roll(state):
        def body(s, _):
            s2 = simulate(model, s, joint_act=act, muscle_act=muscle_act,
                          dt=dt, substeps=ss, mass_matrix_freq=mm)
            return s2, (s2.joint_q, s2.joint_qd)
        _, out = jax.lax.scan(body, state, None, length=steps)
        return out

    q, qd = roll(model.state())
    got = np.asarray(q)
    # tolerances sized from the measured divergence envelope
    # (tools/parity_divergence.py, docs/PARITY.md "Divergence rates"):
    # ant max|dq| vs the reference engine is 4.8e-7 @step15, 5.2e-6 @step40,
    # growing at ~e^{0.15/step} from f32 contact chaos — the bounds below
    # keep ~20x headroom for platform rounding differences. Humanoid/SNU
    # integrate 48 substeps/step (3x the f32 work per step): 10x band.
    deep = scene["env"] in ("Humanoid", "SNUHumanoid")
    early_tol, full_tol = (1e-4, 1e-3) if deep else (1e-5, 1e-4)
    np.testing.assert_allclose(got[:15], fix["joint_q"][:15], atol=early_tol)
    np.testing.assert_allclose(got, fix["joint_q"], atol=full_tol)
