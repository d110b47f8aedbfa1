"""BPTT: full-horizon backprop-through-time policy optimization.

Re-architecture of the reference baseline (/root/reference/algorithms/
bptt.py:33-423) for TPU: the whole H-step rollout (H up to 1000,
cfg/bptt/ant.yaml) is one ``lax.scan`` under ``jit`` with rematerialized
substeps, differentiated end-to-end by ``jax.grad``. Identical loss
conventions to the reference: accumulate discounted reward per env, settle
-rew_acc into the loss when an env finishes (or at the window end), no
critic/bootstrapping (bptt.py:137-214). Optimizer choice gd/sgd/adam
(bptt.py:100, optim/gd.py) maps onto optax.
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from .. import envs as env_registry
from ..models import ActorDeterministicMLP, ActorStochasticMLP
from ..utils import AverageMeter, RunningMeanStd, TimeReport, print_info
from ..utils.tb import TBWriter


def _make_optimizer(name: str, schedule, betas):
    name = name.lower()
    if name == "bptt":  # algo named generically -> reference default optimizer
        name = "adam"
    if name in ("gd", "sgd"):
        # the reference's GD optimizer (optim/gd.py:12-44) is plain sgd
        return optax.sgd(schedule)
    if name == "adam":
        return optax.adam(schedule, b1=betas[0], b2=betas[1])
    if name == "lbfgs":
        # reference: torch.optim.LBFGS with a loss-closure line search
        # (algorithms/bptt.py:100); optax.lbfgs' zoom linesearch re-runs
        # the rollout through value_fn per probe step (see actor_update)
        return optax.lbfgs(
            learning_rate=None, memory_size=10,
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=8
            ),
        )
    raise ValueError(f"unknown optimizer '{name}'")


class BPTT:
    def __init__(self, cfg: Dict[str, Any]):
        params = cfg["params"]
        general = params.get("general", {})
        config = params["config"]

        self.seed = general.get("seed", 0)
        env_name = params["diff_env"]["name"]
        self.env = env_registry.make(
            env_name,
            num_envs=config["num_actors"],
            seed=self.seed,
            episode_length=params["diff_env"].get("episode_length", 250),
            stochastic_init=params["diff_env"].get("stochastic_env", False),
            MM_caching_frequency=params["diff_env"].get("MM_caching_frequency", 1),
            sim_backward=params["diff_env"].get("sim_backward"),
        )

        self.num_envs = self.env.num_envs
        self.num_obs = self.env.num_obs
        self.num_actions = self.env.num_acts

        self.gamma = config.get("gamma", 0.99)
        self.steps_num = config["steps_num"]
        self.max_epochs = config["max_epochs"]
        self.actor_lr = float(config["actor_learning_rate"])
        self.lr_schedule = config.get("lr_schedule", "linear")
        self.rew_scale = config.get("rew_scale", 1.0)
        self.use_obs_rms = config.get("obs_rms", False)
        self.truncate_grad = config.get("truncate_grads", True)
        self.grad_norm = config.get("grad_norm", 1.0)
        self.name = config.get("name", "bptt")

        self.log_dir = general.get("logdir", "./logs")
        os.makedirs(self.log_dir, exist_ok=True)
        self.save_interval = config.get("save_interval", 500)

        cfg_network = params.get("network", {})
        actor_name = cfg_network.get("actor", "ActorStochasticMLP")
        actor_cls = {"ActorStochasticMLP": ActorStochasticMLP,
                     "ActorDeterministicMLP": ActorDeterministicMLP}[actor_name]
        self.actor = actor_cls(self.num_obs, self.num_actions, cfg_network)
        self.stochastic_actor = actor_name == "ActorStochasticMLP"

        key = jax.random.PRNGKey(self.seed)
        key, ka = jax.random.split(key)
        self.actor_params = self.actor.init(ka)
        self.key = key

        betas = tuple(config.get("betas", (0.7, 0.95)))
        algo_name = params.get("algo", {}).get("name", "adam")
        if self.lr_schedule == "linear":
            sched = optax.linear_schedule(self.actor_lr, 1e-5, self.max_epochs)
        else:
            sched = self.actor_lr
        self.actor_opt = _make_optimizer(algo_name, sched, betas)
        self.is_lbfgs = algo_name.lower() == "lbfgs"
        self.actor_opt_state = self.actor_opt.init(self.actor_params)

        self.obs_rms = RunningMeanStd.create((self.num_obs,)) if self.use_obs_rms else None

        self.env_state = self.env.reset(jax.random.PRNGKey(self.seed))
        self.episode_trackers = dict(
            ep_loss=jnp.zeros(self.num_envs),
            ep_disc_loss=jnp.zeros(self.num_envs),
            ep_gamma=jnp.ones(self.num_envs),
            ep_len=jnp.zeros(self.num_envs, dtype=jnp.int32),
        )

        self.iter_count = 0
        self.step_count = 0
        self.episode_loss_meter = AverageMeter(1, 100)
        self.episode_discounted_loss_meter = AverageMeter(1, 100)
        self.episode_length_meter = AverageMeter(1, 100)
        self.episode_loss_his: list = []
        self.episode_discounted_loss_his: list = []
        self.episode_length_his: list = []
        self.best_policy_loss = np.inf
        self.actor_loss = np.inf
        self.time_report = TimeReport()
        self.scalars: Dict[str, list] = {}
        self.writer = TBWriter(os.path.join(self.log_dir, "log"))

        self._build_jitted_fns()

    # ------------------------------------------------------------------ jit

    def _build_jitted_fns(self):
        env = self.env
        H = self.steps_num
        gamma_const = self.gamma
        rew_scale = self.rew_scale

        def rollout(actor_params, env_state, obs_rms, trackers, key, deterministic):
            env_state = lax.stop_gradient(env_state)
            obs = env.batch_observations(env_state)

            rms_frozen = obs_rms
            if obs_rms is not None:
                obs_rms = obs_rms.update(obs)

            def norm(o):
                return rms_frozen.normalize(o) if rms_frozen is not None else o

            def step_fn(carry, i):
                env_state, obs, rew_acc, gamma, loss_acc, obs_rms, trk, key = carry

                obs_n = norm(obs)
                key, k_act = jax.random.split(key)
                if self.stochastic_actor:
                    actions = self.actor(
                        actor_params, obs_n,
                        key=None if deterministic else k_act,
                        deterministic=deterministic,
                    )
                else:
                    actions = self.actor(actor_params, obs_n)
                actions = jnp.tanh(actions)

                env_state, obs_next, rew_raw, done, info = env.step(env_state, actions)
                rew = rew_raw * rew_scale

                if obs_rms is not None:
                    obs_rms = obs_rms.update(obs_next)

                rew_acc = rew_acc + gamma * rew

                # settle -rew_acc for done envs each step, everything at the end
                is_last = i == H - 1
                settle = done | is_last
                loss_acc = loss_acc + jnp.where(settle, -rew_acc, 0.0).sum()

                gamma = gamma * gamma_const
                gamma = jnp.where(done, 1.0, gamma)
                rew_acc = jnp.where(done, 0.0, rew_acc)

                raw = lax.stop_gradient(rew_raw)
                ep_loss = trk["ep_loss"] - raw
                ep_disc = trk["ep_disc_loss"] - trk["ep_gamma"] * raw
                ep_gamma = trk["ep_gamma"] * gamma_const
                ep_len = trk["ep_len"] + 1
                out = dict(
                    done=done,
                    ep_loss_done=jnp.where(done, ep_loss, 0.0),
                    ep_disc_done=jnp.where(done, ep_disc, 0.0),
                    ep_len_done=jnp.where(done, ep_len, 0),
                )
                trk = dict(
                    ep_loss=jnp.where(done, 0.0, ep_loss),
                    ep_disc_loss=jnp.where(done, 0.0, ep_disc),
                    ep_gamma=jnp.where(done, 1.0, ep_gamma),
                    ep_len=jnp.where(done, 0, ep_len),
                )
                carry = (env_state, obs_next, rew_acc, gamma, loss_acc, obs_rms, trk, key)
                return carry, out

            init = (
                env_state, obs,
                jnp.zeros(self.num_envs), jnp.ones(self.num_envs),
                jnp.asarray(0.0), obs_rms, trackers, key,
            )
            carry, outs = lax.scan(step_fn, init, jnp.arange(H))
            env_state, _, _, _, loss_acc, obs_rms, trk, key = carry

            loss = loss_acc / (H * self.num_envs)
            aux = dict(env_state=env_state, obs_rms=obs_rms, trackers=trk,
                       key=key, outs=outs)
            return loss, aux

        def actor_update(actor_params, actor_opt_state, env_state, obs_rms,
                         trackers, key):
            (loss, aux), grads = jax.value_and_grad(rollout, has_aux=True)(
                actor_params, env_state, obs_rms, trackers, key, False,
            )
            grads = jax.tree.map(lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
            gnorm = optax.global_norm(grads)
            if self.truncate_grad:
                scale = jnp.minimum(1.0, self.grad_norm / (gnorm + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
            if self.is_lbfgs:
                # the zoom linesearch probes trial points by re-running the
                # full rollout (the torch LBFGS closure analog)
                updates, actor_opt_state = self.actor_opt.update(
                    grads, actor_opt_state, actor_params,
                    value=loss, grad=grads,
                    value_fn=lambda p: rollout(
                        p, env_state, obs_rms, trackers, key, False
                    )[0],
                )
            else:
                updates, actor_opt_state = self.actor_opt.update(
                    grads, actor_opt_state, actor_params
                )
            actor_params = optax.apply_updates(actor_params, updates)
            return actor_params, actor_opt_state, loss, aux, gnorm

        self._actor_update = jax.jit(actor_update)

    # ---------------------------------------------------------------- train

    def train(self):
        self.start_time = time.time()
        self._best_snapshot = None
        self._last_best_write = 0.0
        tr = self.time_report
        for t in ("algorithm", "actor training"):
            tr.add_timer(t)
        tr.start_timer("algorithm")

        for epoch in range(self.max_epochs):
            t_epoch = time.time()
            tr.start_timer("actor training")
            self.key, k = jax.random.split(self.key)
            (self.actor_params, self.actor_opt_state, actor_loss, aux,
             gnorm) = self._actor_update(
                self.actor_params, self.actor_opt_state, self.env_state,
                self.obs_rms, self.episode_trackers, k,
            )
            tr.end_timer("actor training")

            self.env_state = aux["env_state"]
            self.obs_rms = aux["obs_rms"]
            self.episode_trackers = aux["trackers"]
            self.step_count += self.steps_num * self.num_envs
            self.iter_count += 1

            # one batched device->host transfer (each sync pays tunnel RTT)
            outs, actor_loss, gnorm = jax.device_get(
                (aux["outs"], actor_loss, gnorm)
            )
            self.actor_loss = float(actor_loss)
            done_np = np.asarray(outs["done"]).reshape(-1)
            if done_np.any():
                sel = done_np.astype(bool)
                ep_losses = np.asarray(outs["ep_loss_done"]).reshape(-1)[sel]
                ep_disc = np.asarray(outs["ep_disc_done"]).reshape(-1)[sel]
                ep_lens = np.asarray(outs["ep_len_done"]).reshape(-1)[sel]
                self.episode_loss_meter.update(ep_losses)
                self.episode_discounted_loss_meter.update(ep_disc)
                self.episode_length_meter.update(ep_lens)
                self.episode_loss_his.extend(ep_losses.tolist())
                self.episode_discounted_loss_his.extend(ep_disc.tolist())
                self.episode_length_his.extend(ep_lens.tolist())

            epoch_time = time.time() - t_epoch
            fps = self.steps_num * self.num_envs / epoch_time
            if len(self.episode_loss_his) > 0:
                mean_policy_loss = self.episode_loss_meter.get_mean()
                mean_policy_discounted_loss = self.episode_discounted_loss_meter.get_mean()
                mean_episode_length = self.episode_length_meter.get_mean()
                if mean_policy_loss < self.best_policy_loss:
                    # device-side snapshot is free; throttle disk writes
                    self._best_snapshot = self._snapshot()
                    self.best_policy_loss = mean_policy_loss
                    now = time.time()
                    if now - self._last_best_write > 60.0:
                        print_info(f"save best policy with loss {mean_policy_loss:.2f}")
                        self.save(snapshot=self._best_snapshot)
                        self._last_best_write = now
            else:
                mean_policy_loss = np.inf
                mean_policy_discounted_loss = np.inf
                mean_episode_length = 0

            self._log_scalars(
                time_elapse=time.time() - self.start_time,
                actor_loss=self.actor_loss,
                policy_loss=mean_policy_loss,
                rewards=-mean_policy_loss if np.isfinite(mean_policy_loss) else np.nan,
                episode_lengths=mean_episode_length,
                fps=fps,
            )
            print(
                f"iter {self.iter_count}: ep loss {mean_policy_loss:.2f}, "
                f"ep discounted loss {mean_policy_discounted_loss:.2f}, "
                f"ep len {mean_episode_length:.1f}, fps total {fps:.2f}, "
                f"grad norm {float(gnorm):.2f}"
            )

            if self.save_interval > 0 and self.iter_count % self.save_interval == 0:
                self.save(f"{self.name}policy_iter{self.iter_count}")

        tr.end_timer("algorithm")
        tr.report()
        if self._best_snapshot is not None:
            self.save("best_policy", snapshot=self._best_snapshot)
        self.save("final_policy")
        np.save(os.path.join(self.log_dir, "episode_loss_his.npy"),
                np.array(self.episode_loss_his))
        np.save(os.path.join(self.log_dir, "episode_discounted_loss_his.npy"),
                np.array(self.episode_discounted_loss_his))
        np.save(os.path.join(self.log_dir, "episode_length_his.npy"),
                np.array(self.episode_length_his))

    # ----------------------------------------------------------- evaluation

    def evaluate_policy(self, num_games, deterministic=False):
        env = self.env
        key = self.key
        env_state = env.reset(jax.random.PRNGKey(self.seed + 1))
        obs = env.batch_observations(env_state)

        @jax.jit
        def step(env_state, obs, key):
            key, k = jax.random.split(key)
            obs_n = self.obs_rms.normalize(obs) if self.obs_rms is not None else obs
            if self.stochastic_actor:
                a = self.actor(self.actor_params, obs_n,
                               key=None if deterministic else k,
                               deterministic=deterministic)
            else:
                a = self.actor(self.actor_params, obs_n)
            env_state, obs, rew, done, _ = env.step(env_state, jnp.tanh(a))
            return env_state, obs, rew, done, key

        ep_loss = np.zeros(self.num_envs)
        ep_disc = np.zeros(self.num_envs)
        ep_gamma = np.ones(self.num_envs)
        ep_len = np.zeros(self.num_envs, dtype=int)
        loss_his, disc_his, len_his = [], [], []
        games = 0
        while games < num_games:
            env_state, obs, rew, done, key = step(env_state, obs, key)
            rew_np = np.asarray(rew)
            done_np = np.asarray(done)
            ep_loss -= rew_np
            ep_disc -= ep_gamma * rew_np
            ep_gamma *= self.gamma
            ep_len += 1
            for i in np.nonzero(done_np)[0]:
                loss_his.append(ep_loss[i])
                disc_his.append(ep_disc[i])
                len_his.append(ep_len[i])
                ep_loss[i] = 0.0
                ep_disc[i] = 0.0
                ep_gamma[i] = 1.0
                ep_len[i] = 0
                games += 1
        self.key = key
        return (float(np.mean(loss_his)), float(np.mean(disc_his)),
                float(np.mean(len_his)))

    def run(self, num_games):
        mean_loss, mean_disc, mean_len = self.evaluate_policy(num_games)
        print_info(
            f"mean episode loss = {mean_loss}, mean discounted loss = "
            f"{mean_disc}, mean episode length = {mean_len}"
        )
        return mean_loss, mean_len

    def play(self, cfg):
        self.load(cfg["params"]["general"]["checkpoint"])
        games_num = cfg["params"]["config"].get("player", {}).get("games_num", 1)
        self.run(games_num)

    # ---------------------------------------------------------- checkpoints

    def _snapshot(self):
        return {
            "actor": self.actor_params,
            "obs_rms": self.obs_rms,
            "actor_opt_state": self.actor_opt_state,
            "iter_count": self.iter_count,
            "step_count": self.step_count,
        }

    def save(self, filename=None, snapshot=None):
        filename = filename or "best_policy"
        state = jax.device_get(snapshot if snapshot is not None else self._snapshot())
        with open(os.path.join(self.log_dir, f"{filename}.pkl"), "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        with open(path, "rb") as f:
            state = pickle.load(f)
        as_jnp = partial(jax.tree.map, jnp.asarray)
        self.actor_params = as_jnp(state["actor"])
        if state.get("obs_rms") is not None:
            self.obs_rms = as_jnp(state["obs_rms"])
        if "actor_opt_state" in state:
            self.actor_opt_state = as_jnp(state["actor_opt_state"])
        self.iter_count = state.get("iter_count", 0)
        self.step_count = state.get("step_count", 0)

    # -------------------------------------------------------------- logging

    def _log_scalars(self, time_elapse=None, **kwargs):
        import numpy as _np
        for k, v in kwargs.items():
            self.scalars.setdefault(k, []).append(
                (self.iter_count, self.step_count, float(v))
            )
            if _np.isfinite(float(v)):
                self.writer.log(k, float(v), self.iter_count, self.step_count,
                                time_elapse)
        if self.iter_count % 50 == 0 or self.iter_count == self.max_epochs:
            np.savez(
                os.path.join(self.log_dir, "scalars.npz"),
                **{k: np.array(v) for k, v in self.scalars.items()},
            )
