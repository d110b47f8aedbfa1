"""HTML viewer export (viewer.py — the Omniverse-extension analog,
/root/reference/dflex/extension/dflex.py:75)."""

import json
import os
import re

import jax
import numpy as np

import diffrl_tpu.envs as envs
from diffrl_tpu.viewer import HtmlViewer, export_html


def _rollout(n=4):
    env = envs.make("CartPoleSwingUp", num_envs=1, seed=0)
    es = env.reset(jax.random.PRNGKey(0))
    qs = [np.asarray(es.joint_q[0])]
    for _ in range(n - 1):
        es = env.step(es, np.zeros((1, env.num_acts), np.float32))[0]
        qs.append(np.asarray(es.joint_q[0]))
    return env, np.stack(qs)


def _extract_data(path):
    with open(path) as f:
        html = f.read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA block missing"
    return html, json.loads(m.group(1))


def test_export_html(tmp_path):
    env, qs = _rollout()
    out = os.path.join(str(tmp_path), "roll.html")
    export_html(env.model, qs, out, fps=60.0, title="cartpole")
    html, data = _extract_data(out)
    assert "<canvas" in html and "requestAnimationFrame" in html
    assert len(data["bodies"]) == qs.shape[0]
    assert len(data["bodies"][0]) == env.model.link_count
    # every frame pose is a 7-vector [pos, quat]
    assert all(len(x) == 7 for x in data["bodies"][0])
    assert data["shapes"], "cartpole shapes missing"
    for sh in data["shapes"]:
        assert sh["kind"] in ("sphere", "box", "capsule")


def test_viewer_incremental_and_lines(tmp_path):
    env, qs = _rollout(3)
    v = HtmlViewer(env.model, os.path.join(str(tmp_path), "v.html"))
    from diffrl_tpu.sim.model import State

    for t in range(qs.shape[0]):
        v.update(State(joint_q=qs[t]), t / 60.0)
    v.add_line_strip([[0, 0, 0], [0, 1, 0]], "muscle0", time=0.0)
    path = v.save()
    _, data = _extract_data(path)
    assert len(data["bodies"]) == 3
    assert data["lines"][0]["name"] == "muscle0"
    assert len(data["lines"][0]["points"]) == 2
