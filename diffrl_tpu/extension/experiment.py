"""Runtime-independent experiment driver for the Kit extension.

The reference extension drives a script-defined global ``experiment``
object one tick at a time from Kit's update loop — ``train()`` advances
one optimization step, ``run()`` advances inference, ``reset()`` restarts,
while the UI polls ``train_loss`` / ``render_time`` / ``log_output``
(/root/reference/dflex/extension/dflex.py:395-432). This module provides
that contract without any Omniverse dependency:

- :class:`Experiment` — the minimal duck-typed surface the UI layer needs.
- :class:`PolicyExperiment` — a concrete driver over a diffrl_tpu env +
  SHAC trainer: one jitted training epoch per ``train()`` tick, one env
  step per ``run()`` tick, optional USD recording via render.UsdRenderer.
- :func:`load_experiment_script` — loads a user script and returns its
  experiment (``make_experiment()`` factory preferred; a module-level
  ``experiment`` object is accepted for reference-script compatibility).
"""

from __future__ import annotations

import os
import runpy
from typing import List, Optional

import numpy as np


class Experiment:
    """Duck-typed surface consumed by kit_ext.DiffRLWindow.

    Subclasses override the tick methods; attribute defaults double as the
    documentation of the UI contract.
    """

    #: loss history for the UI plot (most-recent-last)
    train_loss: List[float]
    #: simulated seconds of the rendered trajectory (drives stage timeline)
    render_time: float
    #: text streamed into the UI log widget
    log_output: str
    #: optional policy checkpoint path (set by the UI network picker)
    network_file: Optional[str]
    #: when True, run() ticks append to the USD recording
    record: bool

    def __init__(self):
        self.train_loss = []
        self.render_time = 0.0
        self.log_output = ""
        self.network_file = None
        self.record = True

    def reset(self):  # pragma: no cover - interface default
        raise NotImplementedError

    def train(self):  # one training step per UI tick
        raise NotImplementedError

    def run(self):  # one inference step per UI tick
        raise NotImplementedError

    def log(self, msg: str):
        self.log_output += msg + "\n"


class PolicyExperiment(Experiment):
    """Drive a diffrl_tpu env + SHAC trainer tick-by-tick.

    Parameters
    ----------
    cfg: a SHAC-style config dict (``params.diff_env`` + ``params.config``);
        the same YAML tree examples/cfg/shac/*.yaml use.
    usd_path: when set, ``run()`` ticks with ``record=True`` stream body
        transforms into a UsdRenderer stage saved by :meth:`save_usd`.
    """

    def __init__(self, cfg: dict, logdir: str = "/tmp/diffrl_kit",
                 usd_path: Optional[str] = None):
        super().__init__()
        import jax

        from ..algorithms.shac import SHAC

        cfg = dict(cfg)
        cfg.setdefault("params", {}).setdefault("general", {})
        cfg["params"]["general"].setdefault("logdir", logdir)
        cfg["params"]["general"].setdefault("seed", 0)
        os.makedirs(logdir, exist_ok=True)
        self.trainer = SHAC(cfg)
        self.env = self.trainer.env
        self.usd_path = usd_path
        self._renderer = None
        self._jax = jax
        self.reset()

    # ------------------------------------------------------------------ ticks

    def reset(self):
        import jax

        self.trainer.env_state = self.env.reset(
            jax.random.PRNGKey(self.trainer.seed))
        self.render_time = 0.0
        self.log("reset")

    def train(self):
        """One jitted SHAC epoch (actor window + critic fits)."""
        import jax

        t = self.trainer
        t.key, k = jax.random.split(t.key)
        (t.actor_params, t.actor_opt_state, t.critic_params,
         t.critic_opt_state, t.target_critic_params, t.env_state,
         t.obs_rms, t.ret_rms, t.episode_trackers, stats) = t._train_epoch(
            t.actor_params, t.actor_opt_state, t.critic_params,
            t.critic_opt_state, t.target_critic_params, t.env_state,
            t.obs_rms, t.ret_rms, t.episode_trackers, k)
        loss = float(jax.device_get(stats["actor_loss"]))
        self.train_loss.append(loss)
        self.log(f"epoch {len(self.train_loss)}: actor loss {loss:.4f}")

    def run(self):
        """One policy-driven env step; records USD when enabled."""
        import jax
        import jax.numpy as jnp

        t = self.trainer
        if self.network_file and not getattr(self, "_net_loaded", False):
            t.load(self.network_file)
            self._net_loaded = True
            self.log(f"loaded network {self.network_file}")
        obs = self.env.batch_observations(t.env_state)
        obs = t.obs_rms.normalize(obs) if t.obs_rms is not None else obs
        if t.stochastic_actor:
            act = t.actor(t.actor_params, obs, key=None, deterministic=True)
        else:
            act = t.actor(t.actor_params, obs)
        t.env_state, _obs, _rew, _done, _info = self.env.step(
            t.env_state, jnp.tanh(act))
        self.render_time += self.env.dt
        if self.record and self.usd_path is not None:
            self._record_frame()

    # -------------------------------------------------------------- recording

    def _record_frame(self):
        from ..render import UsdRenderer
        from ..sim.model import State

        if self._renderer is None:
            self._renderer = UsdRenderer(self.env.model, self.usd_path)
        q = np.asarray(self.trainer.env_state.joint_q[0])
        qd = np.asarray(self.trainer.env_state.joint_qd[0])
        self._renderer.update(
            State(joint_q=q, joint_qd=qd), self.render_time)

    def save_usd(self):
        if self._renderer is not None:
            self._renderer.save()
            self.log(f"wrote {self.usd_path}")


def load_experiment_script(path: str) -> Experiment:
    """Load a user experiment script and return its Experiment.

    The script is executed as ``__main__``-style module code. Preferred
    contract: define ``make_experiment() -> Experiment``. For scripts in
    the reference's style that build a module-global ``experiment`` at
    import time, that object is returned instead.
    """
    ns = runpy.run_path(path)
    if "make_experiment" in ns:
        return ns["make_experiment"]()
    if "experiment" in ns and ns["experiment"] is not None:
        return ns["experiment"]
    raise ValueError(
        f"{path}: experiment script must define make_experiment() or a "
        "module-level `experiment` object")
