"""USD export + trajectory recorder tests (reference: dflex/render.py usage
in dflex/tests/test_*.py which write .usd stages per scenario)."""

import dataclasses
import os

import numpy as np

from diffrl_tpu.render import TrajectoryRecorder, UsdRenderer
from diffrl_tpu.sim import ModelBuilder, simulate


def _scene():
    b = ModelBuilder()
    b.add_particle((0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_particle((0.5, 1.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_spring(0, 1, ke=100.0, kd=1.0, control=0.0)
    b.add_shape_sphere(-1, pos=(0.0, 0.0, 0.0), radius=0.3, density=0.0)
    b.add_shape_plane()
    return dataclasses.replace(b.finalize(), ground=True)


def test_usd_renderer_writes_valid_stage(tmp_path):
    model = _scene()
    path = str(tmp_path / "scene.usda")
    r = UsdRenderer(model, path, fps=60.0)

    state = model.state()
    for i in range(3):
        state = simulate(model, state, dt=1.0 / 60.0, substeps=2)
        r.update(state, (i + 1) / 60.0)
    r.add_sphere((1.0, 1.0, 0.0), 0.2, "marker", time=0.0)
    r.add_line_strip([(0, 0, 0), (0, 1, 0), (1, 1, 0)], "muscle0", time=0.0)
    out = r.save()

    assert os.path.exists(out)
    text = open(out).read()
    assert text.startswith("#usda 1.0")
    assert 'def Points "particles"' in text
    assert "point3f[] points.timeSamples" in text
    assert 'def Sphere "shape_' in text   # static sphere collider
    assert 'def Mesh "shape_' in text     # ground plane
    assert 'def Sphere "marker"' in text
    assert 'def BasisCurves "muscle0"' in text
    # balanced braces = structurally valid usda
    assert text.count("{") == text.count("}")


def test_usd_renderer_articulation_bodies(tmp_path):
    from diffrl_tpu.envs import make

    env = make("CartPoleSwingUp", num_envs=1)
    model = env.model
    path = str(tmp_path / "cartpole.usda")
    r = UsdRenderer(model, path)
    r.update(model.state(), 0.0)
    out = r.save()
    text = open(out).read()
    assert 'def Xform "body_' in text
    assert "quatf xformOp:orient.timeSamples" in text


def test_trajectory_recorder(tmp_path):
    model = _scene()
    rec = TrajectoryRecorder()
    state = model.state()
    for _ in range(4):
        state = simulate(model, state, dt=1.0 / 60.0, substeps=2)
        rec.record(state)
    path = rec.save(str(tmp_path / "traj.npz"))
    data = np.load(path)
    assert data["particle_q"].shape == (4, 2, 3)
    assert np.all(np.isfinite(data["particle_q"]))
