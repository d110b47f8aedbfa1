"""SHAC: Short-Horizon Actor-Critic with differentiable simulation.

Re-architecture of the reference trainer (/root/reference/algorithms/
shac.py:35-577) for TPU:

- the 32-step rollout window + actor loss is ONE ``lax.scan`` under ``jit``,
  differentiated end-to-end by ``jax.grad`` through the vmapped simulator
  (replacing the Python step loop + tape replay, shac.py:191-300);
- per-env bookkeeping the reference does with ``.item()`` host loops
  (shac.py:269-289) is branchless device code; episode stats surface as
  masked per-step arrays the host folds into meters;
- TD(lambda) critic targets are a backward scan (shac.py:348-362 semantics);
- critic minibatch epochs, polyak target update, obs/return RMS, Adam(0.7,
  0.95) with linear LR decay, grad-norm clip + NaN defenses all reproduce the
  reference's conventions;
- multi-chip: envs shard over a ``data`` mesh axis; the jitted train step's
  loss/grad means become cross-chip psums inserted by XLA (no Horovod).
"""

from __future__ import annotations

import math
import os
import pickle
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from .. import envs as env_registry
from ..models import ActorDeterministicMLP, ActorStochasticMLP, CriticMLP
from ..utils import AverageMeter, RunningMeanStd, TimeReport, print_info
from ..utils.tb import TBWriter


class SHAC:
    def __init__(self, cfg: Dict[str, Any]):
        params = cfg["params"]
        general = params.get("general", {})
        config = params["config"]

        self.seed = general.get("seed", 0)
        env_name = params["diff_env"]["name"]
        env_kwargs = dict(
            num_envs=config["num_actors"],
            seed=self.seed,
            episode_length=params["diff_env"].get("episode_length", 250),
            stochastic_init=params["diff_env"].get("stochastic_env", True),
            MM_caching_frequency=params["diff_env"].get("MM_caching_frequency", 1),
            sim_backward=params["diff_env"].get("sim_backward"),
        )
        self.env = env_registry.make(env_name, **env_kwargs)

        self.num_envs = self.env.num_envs
        self.num_obs = self.env.num_obs
        self.num_actions = self.env.num_acts
        self.max_episode_length = self.env.episode_length

        self.gamma = config.get("gamma", 0.99)
        self.critic_method = config.get("critic_method", "one-step")
        self.lam = config.get("lambda", 0.95)

        self.steps_num = config["steps_num"]
        self.max_epochs = config["max_epochs"]
        self.actor_lr = float(config["actor_learning_rate"])
        self.critic_lr = float(config["critic_learning_rate"])
        self.lr_schedule = config.get("lr_schedule", "linear")
        self.target_critic_alpha = config.get("target_critic_alpha", 0.4)

        self.use_obs_rms = config.get("obs_rms", False)
        self.use_ret_rms = config.get("ret_rms", False)
        self.rew_scale = config.get("rew_scale", 1.0)

        self.critic_iterations = config.get("critic_iterations", 16)
        self.num_batch = config.get("num_batch", 4)
        self.batch_size = self.num_envs * self.steps_num // self.num_batch
        self.name = config.get("name", "shac")

        self.truncate_grad = config.get("truncate_grads", True)
        self.grad_norm = config.get("grad_norm", 1.0)

        self.log_dir = general.get("logdir", "./logs")
        os.makedirs(self.log_dir, exist_ok=True)
        self.save_interval = config.get("save_interval", 500)

        # networks
        cfg_network = params.get("network", {})
        actor_name = cfg_network.get("actor", "ActorStochasticMLP")
        actor_cls = {"ActorStochasticMLP": ActorStochasticMLP,
                     "ActorDeterministicMLP": ActorDeterministicMLP}[actor_name]
        self.actor = actor_cls(self.num_obs, self.num_actions, cfg_network)
        self.critic = CriticMLP(self.num_obs, cfg_network)
        self.stochastic_actor = actor_name == "ActorStochasticMLP"

        key = jax.random.PRNGKey(self.seed)
        key, ka, kc = jax.random.split(key, 3)
        self.actor_params = self.actor.init(ka)
        self.critic_params = self.critic.init(kc)
        self.target_critic_params = jax.tree.map(jnp.copy, self.critic_params)
        self.key = key

        # optimizers: Adam with reference betas + linear decay to 1e-5
        self.betas = tuple(config.get("betas", (0.7, 0.95)))
        if self.lr_schedule == "linear":
            actor_sched = optax.linear_schedule(self.actor_lr, 1e-5, self.max_epochs)
            # the critic optimizer steps critic_iterations*num_batch times per
            # epoch; scale the schedule horizon so the LR decays over the SAME
            # wall-clock as the reference's per-epoch LR assignment
            critic_steps = self.max_epochs * self.critic_iterations * self.num_batch
            critic_sched = optax.linear_schedule(self.critic_lr, 1e-5, critic_steps)
        else:
            actor_sched, critic_sched = self.actor_lr, self.critic_lr
        self.actor_opt = optax.adam(actor_sched, b1=self.betas[0], b2=self.betas[1])
        self.critic_opt = optax.adam(critic_sched, b1=self.betas[0], b2=self.betas[1])
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)

        self.obs_rms = RunningMeanStd.create((self.num_obs,)) if self.use_obs_rms else None
        self.ret_rms = RunningMeanStd.create(()) if self.use_ret_rms else None

        # env + episode-tracking state
        self.env_state = self.env.reset(jax.random.PRNGKey(self.seed))
        self.episode_trackers = dict(
            ep_loss=jnp.zeros(self.num_envs),
            ep_disc_loss=jnp.zeros(self.num_envs),
            ep_gamma=jnp.ones(self.num_envs),
            ep_len=jnp.zeros(self.num_envs, dtype=jnp.int32),
            ret=jnp.zeros(self.num_envs),
        )

        # multi-device: reference `multi_gpu` flag parity (the reference
        # engages Horovod allreduce, cfg/ppo/ant.yaml:45 + hvd_wrapper.py;
        # here envs shard over a data mesh and XLA inserts the collectives)
        self.mesh = None
        if config.get("multi_gpu", False):
            self.shard_over_mesh()

        # logging / meters
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
        self.value_loss = np.inf
        self.time_report = TimeReport()
        self.scalars: Dict[str, list] = {}
        self.writer = TBWriter(os.path.join(self.log_dir, "log"))

        self._build_jitted_fns()

    def shard_over_mesh(self, num_devices=None):
        """Shard the env axis over a ``data`` mesh; replicate learner state.

        The jitted epoch's loss/grad means then lower to psums over ICI —
        the TPU-native replacement for the reference's Horovod
        DistributedOptimizer. For multi-host pods call
        ``parallel.mesh.init_distributed()`` before constructing the trainer.
        """
        from ..parallel import mesh as mesh_lib

        self.mesh = mesh_lib.make_data_mesh(num_devices)
        if self.num_envs % self.mesh.size:
            raise ValueError(
                f"num_envs={self.num_envs} not divisible by mesh size {self.mesh.size}"
            )
        self.env_state = mesh_lib.shard_env_axis(self.mesh, self.env_state, self.num_envs)
        self.episode_trackers = mesh_lib.shard_env_axis(self.mesh, self.episode_trackers, self.num_envs)
        for attr in ("actor_params", "critic_params", "target_critic_params",
                     "actor_opt_state", "critic_opt_state", "obs_rms", "ret_rms"):
            v = getattr(self, attr)
            if v is not None:
                setattr(self, attr, mesh_lib.replicate(self.mesh, v))

    # ------------------------------------------------------------------ jit

    def _build_jitted_fns(self):
        env = self.env
        H = self.steps_num
        gamma_const = self.gamma
        rew_scale = self.rew_scale
        max_ep_len = self.max_episode_length

        def rollout(actor_params, target_critic_params, env_state,
                    obs_rms, ret_rms, trackers, key, deterministic):
            """Scan the H-step window; returns (loss, aux)."""
            env_state = lax.stop_gradient(env_state)
            obs = env.batch_observations(env_state)

            rms_frozen = obs_rms
            if obs_rms is not None:
                obs_rms = obs_rms.update(obs)

            ret_var = ret_rms.var if ret_rms is not None else None

            def norm(o):
                return rms_frozen.normalize(o) if rms_frozen is not None else o

            def step_fn(carry, i):
                (env_state, obs, rew_acc, gamma, loss_acc, obs_rms, ret_rms,
                 trk, key) = carry

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
                if ret_rms is not None:
                    new_ret = trk["ret"] * gamma_const + rew
                    trk = dict(trk, ret=new_ret)
                    ret_rms = ret_rms.update(new_ret)
                    rew = rew / jnp.sqrt(ret_var + 1e-6)

                # bootstrap values (shac.py:225-243 semantics, branchless)
                obs_next_n = norm(obs_next)
                v_next = self.critic(target_critic_params, obs_next_n)[..., 0]

                obs_br = info["obs_before_reset"]
                obs_br_n = norm(obs_br)
                bad = (
                    jnp.any(~jnp.isfinite(obs_br), axis=-1)
                    | jnp.any(jnp.abs(obs_br) > 1e6, axis=-1)
                )
                v_term = self.critic(
                    target_critic_params, jnp.where(bad[:, None], 0.0, obs_br_n)
                )[..., 0]
                truncation = info["truncation"]
                # done env value: 0 if bad or early-terminated, else V(term obs)
                v_done = jnp.where(bad, 0.0, jnp.where(truncation, v_term, 0.0))
                next_value = jnp.where(done, v_done, v_next)

                rew_acc = rew_acc + gamma * rew

                is_last = i == H - 1
                settle = done | is_last
                loss_contrib = jnp.where(
                    settle, -rew_acc - gamma_const * gamma * next_value, 0.0
                ).sum()
                loss_acc = loss_acc + loss_contrib

                gamma = gamma * gamma_const
                gamma = jnp.where(done, 1.0, gamma)
                rew_acc = jnp.where(done, 0.0, rew_acc)

                # episode stats (device-side; host folds after the scan)
                raw = lax.stop_gradient(rew_raw)
                ep_loss = trk["ep_loss"] - raw
                ep_disc = trk["ep_disc_loss"] - trk["ep_gamma"] * raw
                ep_gamma = trk["ep_gamma"] * gamma_const
                ep_len = trk["ep_len"] + 1
                out = dict(
                    obs=lax.stop_gradient(obs_n),
                    rew=lax.stop_gradient(rew),
                    done=done,
                    next_value=lax.stop_gradient(next_value),
                    ep_loss_done=jnp.where(done, ep_loss, 0.0),
                    ep_disc_done=jnp.where(done, ep_disc, 0.0),
                    ep_len_done=jnp.where(done, ep_len, 0),
                )
                trk = dict(
                    trk,
                    ep_loss=jnp.where(done, 0.0, ep_loss),
                    ep_disc_loss=jnp.where(done, 0.0, ep_disc),
                    ep_gamma=jnp.where(done, 1.0, ep_gamma),
                    ep_len=jnp.where(done, 0, ep_len),
                )

                carry = (env_state, obs_next, rew_acc, gamma, loss_acc,
                         obs_rms, ret_rms, trk, key)
                return carry, out

            init = (
                env_state,
                obs,
                jnp.zeros(self.num_envs),
                jnp.ones(self.num_envs),
                jnp.asarray(0.0),
                obs_rms,
                ret_rms,
                trackers,
                key,
            )
            carry, outs = lax.scan(step_fn, init, jnp.arange(H))
            (env_state, _, _, _, loss_acc, obs_rms, ret_rms, trk, key) = carry

            loss = loss_acc / (H * self.num_envs)
            if ret_rms is not None:
                loss = loss * jnp.sqrt(ret_var + 1e-6)

            aux = dict(
                env_state=env_state, obs_rms=obs_rms, ret_rms=ret_rms,
                trackers=trk, key=key, outs=outs,
            )
            return loss, aux

        def actor_update(actor_params, actor_opt_state, target_critic_params,
                         env_state, obs_rms, ret_rms, trackers, key):
            (loss, aux), grads = jax.value_and_grad(rollout, has_aux=True)(
                actor_params, target_critic_params, env_state,
                obs_rms, ret_rms, trackers, key, False,
            )
            # NaN defense + clipping (shac.py:414-423 + nan_to_num convention)
            grads = jax.tree.map(lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
            gnorm_before = optax.global_norm(grads)
            if self.truncate_grad:
                scale = jnp.minimum(1.0, self.grad_norm / (gnorm_before + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
            gnorm_after = optax.global_norm(grads)
            updates, actor_opt_state = self.actor_opt.update(
                grads, actor_opt_state, actor_params
            )
            actor_params = optax.apply_updates(actor_params, updates)
            return actor_params, actor_opt_state, loss, aux, gnorm_before, gnorm_after

        def compute_target_values(rew_buf, done_mask, next_values):
            """TD(lambda) backward recursion (shac.py:348-362)."""
            if self.critic_method == "one-step":
                return rew_buf + gamma_const * next_values

            lam_c = self.lam

            def back(carry, xs):
                Ai, Bi, lam = carry
                rew, done, nv = xs
                lam = lam * lam_c * (1.0 - done) + done
                Ai = (1.0 - done) * (
                    lam_c * gamma_const * Ai
                    + gamma_const * nv
                    + (1.0 - lam) / (1.0 - lam_c) * rew
                )
                Bi = gamma_const * (nv * done + Bi * (1.0 - done)) + rew
                target = (1.0 - lam_c) * Ai + lam * Bi
                return (Ai, Bi, lam), target

            E = rew_buf.shape[1]
            init = (jnp.zeros(E), jnp.zeros(E), jnp.ones(E))
            _, targets = lax.scan(
                back, init, (rew_buf, done_mask, next_values), reverse=True
            )
            return targets

        def critic_update(critic_params, critic_opt_state, obs_flat, target_flat, key):
            """critic_iterations x num_batch minibatch MSE steps, with a
            fresh random permutation of the (H*E) dataset each iteration
            (matching the reference's shuffled CriticDataset,
            utils/dataset.py:11-36).

            Layout (measured, tools/bench_critic.py on the v5e): obs and
            target are concatenated once and the WHOLE dataset is shuffled
            once per iteration; minibatches are then contiguous dynamic
            slices. Identical batches to gathering each minibatch from the
            permutation (params match to f32 round-off), but 0.59 ms/step
            vs 0.84 — per-minibatch random gathers dominated this
            launch-bound loop."""
            n = obs_flat.shape[0]
            bs = self.batch_size
            nb = (n - 1) // bs + 1
            data = jnp.concatenate([obs_flat, target_flat[:, None]], axis=1)

            def mse(params, o, t, w):
                v = self.critic(params, o)[..., 0]
                return jnp.sum((v - t) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)

            def one_iter(carry, it_key):
                params, opt_state = carry
                shuffled = data[jax.random.permutation(it_key, n)]
                if nb * bs > n:
                    # pad with copies of the final row, weighted 0 below —
                    # same rows the old clamped-index gather produced
                    shuffled = jnp.concatenate(
                        [shuffled,
                         jnp.broadcast_to(shuffled[-1:],
                                          (nb * bs - n, shuffled.shape[1]))],
                        axis=0)

                def one_batch(carry, b):
                    params, opt_state, total = carry
                    start = b * bs
                    w = (start + jnp.arange(bs) < n).astype(jnp.float32)
                    d = lax.dynamic_slice_in_dim(shuffled, start, bs)
                    o, t = d[:, :-1], d[:, -1]
                    loss, grads = jax.value_and_grad(mse)(params, o, t, w)
                    grads = jax.tree.map(lambda g: jnp.nan_to_num(g, 0.0, 0.0, 0.0), grads)
                    if self.truncate_grad:
                        gn = optax.global_norm(grads)
                        scale = jnp.minimum(1.0, self.grad_norm / (gn + 1e-12))
                        grads = jax.tree.map(lambda g: g * scale, grads)
                    updates, opt_state = self.critic_opt.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state, total + loss), None

                (params, opt_state, total), _ = lax.scan(
                    one_batch, (params, opt_state, 0.0), jnp.arange(nb)
                )
                return (params, opt_state), total / nb

            (critic_params, critic_opt_state), losses = lax.scan(
                one_iter, (critic_params, critic_opt_state),
                jax.random.split(key, self.critic_iterations),
            )
            return critic_params, critic_opt_state, losses[-1]

        def polyak(target_params, params):
            a = self.target_critic_alpha
            return jax.tree.map(lambda t, p: t * a + p * (1.0 - a), target_params, params)

        def train_epoch(actor_params, actor_opt_state, critic_params,
                        critic_opt_state, target_critic_params, env_state,
                        obs_rms, ret_rms, trackers, key):
            """One full SHAC epoch in a single compiled program: rollout +
            backprop-through-sim actor step, TD(lambda) targets, all critic
            minibatch iterations, and the polyak target update. One host
            dispatch + one sync per epoch instead of four."""
            key_actor, key_critic = jax.random.split(key)
            (actor_params, actor_opt_state, actor_loss, aux,
             gnorm_before, gnorm_after) = actor_update(
                actor_params, actor_opt_state, target_critic_params,
                env_state, obs_rms, ret_rms, trackers, key_actor,
            )
            outs = aux["outs"]
            target_values = compute_target_values(
                outs["rew"],
                outs["done"].astype(jnp.float32).at[-1].set(1.0),
                outs["next_value"],
            )
            critic_params, critic_opt_state, value_loss = critic_update(
                critic_params, critic_opt_state,
                outs["obs"].reshape(-1, self.num_obs),
                target_values.reshape(-1),
                key_critic,
            )
            target_critic_params = polyak(target_critic_params, critic_params)
            stats = dict(
                actor_loss=actor_loss, value_loss=value_loss,
                gnorm_before=gnorm_before, gnorm_after=gnorm_after,
                done=outs["done"],
                ep_loss_done=outs["ep_loss_done"],
                ep_disc_done=outs["ep_disc_done"],
                ep_len_done=outs["ep_len_done"],
            )
            return (actor_params, actor_opt_state, critic_params,
                    critic_opt_state, target_critic_params,
                    aux["env_state"], aux["obs_rms"], aux["ret_rms"],
                    aux["trackers"], stats)

        self._rollout = rollout
        self._actor_update = jax.jit(actor_update)
        self._compute_target_values = jax.jit(compute_target_values)
        self._critic_update = jax.jit(critic_update)
        self._polyak = jax.jit(polyak)
        self._train_epoch = jax.jit(train_epoch)

    # ---------------------------------------------------------------- train

    def train(self):
        self.start_time = time.time()
        self._best_snapshot = None
        self._last_best_write = 0.0
        tr = self.time_report
        for t in ("algorithm", "actor training"):
            tr.add_timer(t)
        tr.start_timer("algorithm")

        # Pipelined epoch loop: dispatch epoch k+1 BEFORE blocking on epoch
        # k's stats, so the tunnel RTT + stats transfer + host bookkeeping
        # overlap the next epoch's device compute. Measured on the tunneled
        # v5e (tools/profile_train_phases.py): the serialized loop left the
        # chip idle ~60 ms/epoch (418 ms wall vs 352 ms device bound)
        # between device_get returning and the next dispatch arriving; jax's
        # async dispatch makes the overlap free. Epoch k's stats are
        # processed right after epoch k+1 is in flight (pipeline depth 2).
        pending = None
        self._t_last_epoch = time.time()
        for epoch in range(self.max_epochs):
            self.key, k = jax.random.split(self.key)
            (self.actor_params, self.actor_opt_state, self.critic_params,
             self.critic_opt_state, self.target_critic_params,
             self.env_state, self.obs_rms, self.ret_rms,
             self.episode_trackers, stats) = self._train_epoch(
                self.actor_params, self.actor_opt_state, self.critic_params,
                self.critic_opt_state, self.target_critic_params,
                self.env_state, self.obs_rms, self.ret_rms,
                self.episode_trackers, k,
            )
            # post-epoch param handles for a potential best-policy snapshot
            # (jnp arrays are immutable — holding references is free)
            snap = {
                "actor": self.actor_params,
                "critic": self.critic_params,
                "target_critic": self.target_critic_params,
                "obs_rms": self.obs_rms,
                "ret_rms": self.ret_rms,
                "actor_opt_state": self.actor_opt_state,
                "critic_opt_state": self.critic_opt_state,
            }
            if pending is not None:
                self._process_epoch_stats(*pending)
            pending = (stats, snap)
        if pending is not None:
            self._process_epoch_stats(*pending)

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

    def _process_epoch_stats(self, stats, snap):
        """Host-side half of one epoch: fetch stats, fold episode meters,
        track/snapshot the best policy, and log — runs while the NEXT
        epoch's compute is already in flight on the device."""
        # ONE batched device->host transfer per epoch: piecemeal
        # float()/np.asarray() syncs are round-trips each (the TPU here
        # is reached through a tunnel, so every sync pays network RTT)
        stats = jax.device_get(stats)
        outs = stats
        gnorm_before = stats["gnorm_before"]
        gnorm_after = stats["gnorm_after"]
        self.actor_loss = float(stats["actor_loss"])
        self.value_loss = float(stats["value_loss"])
        self.step_count += self.steps_num * self.num_envs
        self.iter_count += 1

        # fold device-side episode stats into host meters
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

        now = time.time()
        epoch_time = now - self._t_last_epoch
        self._t_last_epoch = now
        # per-epoch wall-clock (dispatch + device compute + host half, all
        # pipelined) — timing only the async dispatch would be meaningless
        self.time_report.add_time("actor training", epoch_time)
        fps = self.steps_num * self.num_envs / epoch_time
        if len(self.episode_loss_his) > 0:
            mean_policy_loss = self.episode_loss_meter.get_mean()
            mean_policy_discounted_loss = self.episode_discounted_loss_meter.get_mean()
            mean_episode_length = self.episode_length_meter.get_mean()
            if mean_policy_loss < self.best_policy_loss:
                # snapshot is free (immutable device arrays); the disk
                # write is throttled — early training improves the best
                # loss nearly every epoch and a pickle per epoch of
                # tunneled device fetches dominated wall-clock
                self._best_snapshot = dict(
                    snap, iter_count=self.iter_count,
                    step_count=self.step_count,
                )
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
            value_loss=self.value_loss,
            policy_loss=mean_policy_loss,
            rewards=-mean_policy_loss if np.isfinite(mean_policy_loss) else np.nan,
            episode_lengths=mean_episode_length,
            fps=fps,
        )

        print(
            f"iter {self.iter_count}: ep loss {mean_policy_loss:.2f}, "
            f"ep discounted loss {mean_policy_discounted_loss:.2f}, "
            f"ep len {mean_episode_length:.1f}, fps total {fps:.2f}, "
            f"value loss {self.value_loss:.5f}, "
            f"grad norm before/after clip {float(gnorm_before):.2f}/{float(gnorm_after):.2f}"
        )

        if self.save_interval > 0 and self.iter_count % self.save_interval == 0:
            # use the carried epoch-k snapshot: under the pipelined loop,
            # self.*_params already belong to the in-flight epoch k+1 (and
            # fetching them here would block on it)
            self.save(
                f"{self.name}policy_iter{self.iter_count}_reward{-mean_policy_loss:.3f}",
                snapshot=dict(snap, iter_count=self.iter_count,
                              step_count=self.step_count),
            )

    # ----------------------------------------------------------- evaluation

    def evaluate_policy(self, num_games, deterministic=False):
        """Device-side batched evaluation (see eval_utils.batched_eval):
        chunks of steps run in one jitted scan with episode stats reduced on
        device — one dispatch + one sync per chunk, not per step."""
        from .eval_utils import batched_eval

        def act_fn(obs, k):
            obs_n = self.obs_rms.normalize(obs) if self.obs_rms is not None else obs
            if self.stochastic_actor:
                a = self.actor(self.actor_params, obs_n,
                               key=None if deterministic else k,
                               deterministic=deterministic)
            else:
                a = self.actor(self.actor_params, obs_n)
            return jnp.tanh(a)

        mean_rew, mean_disc, mean_len = batched_eval(
            self.env, act_fn, jax.random.PRNGKey(self.seed + 1), num_games,
            gamma=self.gamma,
        )
        return -mean_rew, -mean_disc, mean_len

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
        """Zero-cost training-state snapshot: jnp arrays are immutable, so
        holding references freezes the state without any device work."""
        return {
            "actor": self.actor_params,
            "critic": self.critic_params,
            "target_critic": self.target_critic_params,
            "obs_rms": self.obs_rms,
            "ret_rms": self.ret_rms,
            # full optimizer state => exact training resume (improves on the
            # reference, which cannot resume optimizers — SURVEY.md §5)
            "actor_opt_state": self.actor_opt_state,
            "critic_opt_state": self.critic_opt_state,
            "iter_count": self.iter_count,
            "step_count": self.step_count,
        }

    def save(self, filename=None, snapshot=None):
        filename = filename or "best_policy"
        # one batched device->host fetch (vs a transfer per leaf)
        state = jax.device_get(snapshot if snapshot is not None else self._snapshot())
        with open(os.path.join(self.log_dir, f"{filename}.pkl"), "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        with open(path, "rb") as f:
            state = pickle.load(f)
        as_jnp = partial(jax.tree.map, jnp.asarray)
        self.actor_params = as_jnp(state["actor"])
        self.critic_params = as_jnp(state["critic"])
        self.target_critic_params = as_jnp(state["target_critic"])
        if state.get("obs_rms") is not None:
            self.obs_rms = as_jnp(state["obs_rms"])
        if state.get("ret_rms") is not None:
            self.ret_rms = as_jnp(state["ret_rms"])
        if "actor_opt_state" in state:
            self.actor_opt_state = as_jnp(state["actor_opt_state"])
            self.critic_opt_state = as_jnp(state["critic_opt_state"])
        self.iter_count = state.get("iter_count", 0)
        self.step_count = state.get("step_count", 0)

    # -------------------------------------------------------------- logging

    def _log_scalars(self, time_elapse=None, **kwargs):
        for k, v in kwargs.items():
            self.scalars.setdefault(k, []).append(
                (self.iter_count, self.step_count, float(v))
            )
            if np.isfinite(float(v)):
                # reference tag triplet name/{iter,step,time} (shac.py:490-528)
                self.writer.log(k, float(v), self.iter_count, self.step_count,
                                time_elapse)
        if self.iter_count % 50 == 0 or self.iter_count == self.max_epochs:
            np.savez(
                os.path.join(self.log_dir, "scalars.npz"),
                **{k: np.array(v) for k, v in self.scalars.items()},
            )
