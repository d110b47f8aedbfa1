"""Headless tests for the Kit extension's driver layer.

The UI layer (extension/kit_ext.py) needs an Omniverse runtime; its
experiment protocol, tick driver, script loading, and mode machine are
runtime-independent and covered here (reference surface:
/root/reference/dflex/extension/dflex.py:395-460 — per-tick train/run,
loss history for the plot, timeline time, script-defined experiment).
"""

import os
import textwrap

import numpy as np
import yaml

from diffrl_tpu.extension import PolicyExperiment, load_experiment_script
from diffrl_tpu.extension.kit_ext import DiffRLExtension


def _tiny_cfg():
    base = os.path.join(os.path.dirname(__file__), "..", "examples", "cfg",
                        "shac", "cartpole_swing_up.yaml")
    cfg = yaml.safe_load(open(base))
    c = cfg["params"]["config"]
    c["num_actors"] = 4
    c["steps_num"] = 4
    c["max_epochs"] = 2
    c["save_interval"] = 0
    return cfg


def test_policy_experiment_ticks(tmp_path):
    usd = str(tmp_path / "traj.usda")
    exp = PolicyExperiment(_tiny_cfg(), logdir=str(tmp_path / "log"),
                           usd_path=usd)

    exp.train()
    exp.train()
    assert len(exp.train_loss) == 2
    assert all(np.isfinite(v) for v in exp.train_loss)

    exp.reset()
    assert exp.render_time == 0.0
    for _ in range(3):
        exp.run()
    assert abs(exp.render_time - 3 * exp.env.dt) < 1e-9
    exp.save_usd()
    text = open(usd).read()
    assert "timeSample" in text or "xformOp" in text
    assert "epoch" in exp.log_output and "reset" in exp.log_output


def test_load_experiment_script(tmp_path):
    script = tmp_path / "exp.py"
    script.write_text(textwrap.dedent("""
        from diffrl_tpu.extension import Experiment

        class Counter(Experiment):
            def __init__(self):
                super().__init__()
                self.n = 0
            def reset(self):
                self.n = 0
            def train(self):
                self.n += 1
                self.train_loss.append(float(-self.n))
            def run(self):
                self.render_time += 1.0 / 60.0

        def make_experiment():
            return Counter()
    """))
    exp = load_experiment_script(str(script))
    exp.train()
    assert exp.train_loss == [-1.0]

    # reference-style: module-level `experiment` object, no factory
    script2 = tmp_path / "exp2.py"
    script2.write_text(
        "from diffrl_tpu.extension import Experiment\n"
        "experiment = Experiment()\n")
    assert isinstance(load_experiment_script(str(script2)), object)


def test_kit_extension_mode_machine(tmp_path):
    """DiffRLExtension's action/update logic runs headless (no omni)."""
    ext = DiffRLExtension()
    assert ext.get_stage_script() is None  # no stage: graceful None
    ext._on_update()  # no experiment: no-op

    class Dummy:
        def __init__(self):
            self.train_loss = []
            self.render_time = 0.0
            self.log_output = ""
            self.network_file = None
            self.record = True
            self.resets = 0

        def reset(self):
            self.resets += 1

        def train(self):
            self.train_loss.append(-1.0)

        def run(self):
            self.render_time += 1.0 / 60.0

    ext.experiment = Dummy()
    ext.train()
    assert ext.mode == "training" and ext.experiment.resets == 1
    ext._on_update()
    assert ext.experiment.train_loss == [-1.0]
    ext.run()
    assert ext.mode == "inference"
    ext._on_update()
    assert ext.experiment.render_time > 0
    ext.stop()
    assert ext.mode == "stopped"
    ext.reset()
    assert ext.experiment.resets == 3  # run() + reset() each reset too
