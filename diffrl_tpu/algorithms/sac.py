"""SAC: soft actor-critic baseline.

Fresh TPU-native implementation of the reference's vendored SAC
(/root/reference/externals/rl_games/rl_games/algos_torch/sac_agent.py),
scoped to cfg/sac/*.yaml: twin Q networks with polyak targets
(update_critic, sac_agent.py:239), squashed-Gaussian actor + learnable
temperature alpha against a -|A| entropy target (update_actor_and_alpha,
sac_agent.py:263), uniform replay (vanilla_replay_buffer), obs normalization,
`num_seed_steps` epochs of random actions before learning.

TPU design: the replay buffer is a device-resident ring of [capacity, dim]
arrays written with dynamic_update_slice (capacity rounded to a multiple of
num_envs so block writes never wrap mid-batch; see algorithms/replay.py,
which also provides the proportional-prioritized variant enabled by
config.prioritized_replay); an entire epoch (num_steps_per_episode env
steps, each followed by one gradient update on a sampled batch) is ONE
jitted scan — there is no host<->device traffic inside the epoch.
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
from ..models import DoubleCriticMLP, SACActor
from ..utils import AverageMeter, RunningMeanStd, TimeReport, print_info
from ..utils.tb import TBWriter
from . import replay


class SAC:
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
            episode_length=params["diff_env"].get("episode_length", 1000),
            stochastic_init=params["diff_env"].get("stochastic_env", True),
            MM_caching_frequency=params["diff_env"].get("MM_caching_frequency", 1),
        )
        self.num_envs = self.env.num_envs
        self.num_obs = self.env.num_obs
        self.num_actions = self.env.num_acts

        self.gamma = config.get("gamma", 0.99)
        self.max_epochs = config.get("max_epochs", 5000)
        self.steps_per_epoch = config.get("num_steps_per_episode", 128)
        self.batch_size = config.get("batch_size", 4096)
        self.actor_lr = float(config.get("actor_lr", 5e-4))
        self.critic_lr = float(config.get("critic_lr", 5e-4))
        self.alpha_lr = float(config.get("alpha_lr", 5e-3))
        self.critic_tau = config.get("critic_tau", 0.005)
        self.init_alpha = config.get("init_alpha", 1.0)
        self.learnable_alpha = config.get("learnable_temperature", True)
        self.num_seed_steps = config.get("num_seed_steps", 5)
        self.normalize_input = config.get("normalize_input", True)
        self.rew_scale = config.get("reward_shaper", {}).get("scale_value", 1.0)
        self.name = config.get("name", "sac")
        self.target_entropy = -float(self.num_actions)

        cap = config.get("replay_buffer_size", 1_000_000)
        self.capacity = max(1, cap // self.num_envs) * self.num_envs
        # proportional prioritized replay (rl_games PrioritizedReplayBuffer
        # + segment_tree.py equivalent — algorithms/replay.py)
        self.prioritized = config.get("prioritized_replay", False)
        self.prio_alpha = config.get("priority_alpha", 0.6)
        self.prio_beta = config.get("priority_beta", 0.4)

        self.log_dir = general.get("logdir", "./logs")
        os.makedirs(self.log_dir, exist_ok=True)
        self.save_interval = config.get("save_frequency", 0)

        cfg_network = params.get("network", {})
        self.actor = SACActor(self.num_obs, self.num_actions, cfg_network)
        self.critic = DoubleCriticMLP(self.num_obs, self.num_actions, cfg_network)

        key = jax.random.PRNGKey(self.seed)
        key, ka, kc = jax.random.split(key, 3)
        self.actor_params = self.actor.init(ka)
        self.critic_params = self.critic.init(kc)
        self.target_critic_params = jax.tree.map(jnp.copy, self.critic_params)
        self.log_alpha = jnp.asarray(np.log(self.init_alpha), dtype=jnp.float32)
        self.key = key

        self.actor_opt = optax.adam(self.actor_lr)
        self.critic_opt = optax.adam(self.critic_lr)
        self.alpha_opt = optax.adam(self.alpha_lr)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)
        self.alpha_opt_state = self.alpha_opt.init(self.log_alpha)

        self.obs_rms = RunningMeanStd.create((self.num_obs,)) if self.normalize_input else None

        self.env_state = self.env.reset(jax.random.PRNGKey(self.seed))
        self.buffer = replay.make_buffer(
            self.capacity, self.num_obs, self.num_actions,
            prioritized=self.prioritized,
        )
        self.episode_trackers = dict(
            ep_rew=jnp.zeros(self.num_envs),
            ep_len=jnp.zeros(self.num_envs, dtype=jnp.int32),
        )

        self.iter_count = 0
        self.step_count = 0
        self.episode_rew_meter = AverageMeter(1, 100)
        self.episode_length_meter = AverageMeter(1, 100)
        self.best_rew = -np.inf
        self.time_report = TimeReport()
        self.scalars: Dict[str, list] = {}
        self.writer = TBWriter(os.path.join(self.log_dir, "log"))

        self._build_jitted_fns()

    # ------------------------------------------------------------------ jit

    def _build_jitted_fns(self):
        env = self.env
        E = self.num_envs
        gamma = self.gamma

        def norm(obs_rms, o):
            return obs_rms.normalize(o) if obs_rms is not None else o

        def update_step(learner, batch, weights, key):
            (actor_params, critic_params, target_params, log_alpha,
             a_opt, c_opt, al_opt, obs_rms) = learner
            obs, actions, rews, next_obs, dones = batch
            obs_n = norm(obs_rms, obs)
            next_obs_n = norm(obs_rms, next_obs)
            alpha = jnp.exp(log_alpha)

            # --- critic update (sac_agent.py:239-261)
            key, k1, k2 = jax.random.split(key, 3)
            next_a, next_logp = self.actor.sample(actor_params, next_obs_n, k1)
            tq1, tq2 = self.critic(target_params, next_obs_n, next_a)
            target_v = jnp.minimum(tq1[..., 0], tq2[..., 0]) - alpha * next_logp
            # where() not (1-done)*v: 0*NaN would still poison terminal
            # transitions whose next_obs hit the env's blow-up defenses
            target_q = rews + gamma * jnp.where(dones > 0.0, 0.0, target_v)
            target_q = lax.stop_gradient(target_q)

            def critic_loss(cp):
                q1, q2 = self.critic(cp, obs_n, actions)
                d1 = q1[..., 0] - target_q
                d2 = q2[..., 0] - target_q
                # weights = IS correction for prioritized replay (all-ones
                # under uniform sampling); td returned for priority updates
                loss = (weights * d1**2).mean() + (weights * d2**2).mean()
                return loss, 0.5 * (jnp.abs(d1) + jnp.abs(d2))

            (c_loss, td_err), c_grads = jax.value_and_grad(
                critic_loss, has_aux=True
            )(critic_params)
            c_updates, c_opt = self.critic_opt.update(c_grads, c_opt, critic_params)
            critic_params = optax.apply_updates(critic_params, c_updates)

            # --- actor update (sac_agent.py:263-288)
            def actor_loss(ap):
                a, logp = self.actor.sample(ap, obs_n, k2)
                q1, q2 = self.critic(critic_params, obs_n, a)
                q = jnp.minimum(q1[..., 0], q2[..., 0])
                return (alpha * logp - q).mean(), logp

            (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(
                actor_params
            )
            a_updates, a_opt = self.actor_opt.update(a_grads, a_opt, actor_params)
            actor_params = optax.apply_updates(actor_params, a_updates)

            # --- alpha update
            if self.learnable_alpha:
                def alpha_loss(la):
                    return (
                        jnp.exp(la) * lax.stop_gradient(-logp - self.target_entropy)
                    ).mean()

                al_loss, al_grads = jax.value_and_grad(alpha_loss)(log_alpha)
                al_updates, al_opt = self.alpha_opt.update(al_grads, al_opt, log_alpha)
                log_alpha = optax.apply_updates(log_alpha, al_updates)

            # --- polyak target (sac_agent.py soft_update_params)
            tau = self.critic_tau
            target_params = jax.tree.map(
                lambda t, p: t * (1.0 - tau) + p * tau, target_params, critic_params
            )

            learner = (actor_params, critic_params, target_params, log_alpha,
                       a_opt, c_opt, al_opt, obs_rms)
            return learner, (c_loss, a_loss, jnp.exp(log_alpha)), td_err

        def train_epoch(learner, env_state, buffer, trackers, key, seed_phase: bool):
            def step_fn(carry, _):
                learner, env_state, buffer, trk, key = carry
                (actor_params, _, _, _, _, _, _, obs_rms) = learner

                obs = env.batch_observations(env_state)
                key, k_act, k_batch, k_upd = jax.random.split(key, 4)
                if seed_phase:
                    actions = jax.random.uniform(
                        k_act, (E, self.num_actions), minval=-1.0, maxval=1.0
                    )
                else:
                    actions, _ = self.actor.sample(
                        actor_params, norm(obs_rms, obs), k_act
                    )

                env_state, obs_next, rew_raw, done, info = env.step(env_state, actions)
                rew = rew_raw * self.rew_scale

                if obs_rms is not None:
                    obs_rms = obs_rms.update(obs_next)
                    learner = learner[:-1] + (obs_rms,)

                # store the PRE-reset successor so bootstrap sees the true
                # terminal state (the reference stores env-returned obs);
                # sanitized: blow-up terminations may carry NaN/inf
                next_obs = jnp.clip(
                    jnp.nan_to_num(info["obs_before_reset"], 0.0, 0.0, 0.0),
                    -1e6, 1e6,
                )
                buffer = replay.add(
                    buffer, obs, actions, rew, next_obs,
                    done.astype(jnp.float32),
                )

                if not seed_phase:
                    if self.prioritized:
                        idx, batch, weights = replay.sample_prioritized(
                            buffer, k_batch, self.batch_size,
                            alpha=self.prio_alpha, beta=self.prio_beta,
                        )
                    else:
                        idx, batch, weights = replay.sample_uniform(
                            buffer, k_batch, self.batch_size
                        )
                    learner, losses, td_err = update_step(
                        learner, batch, weights, k_upd
                    )
                    if self.prioritized:
                        buffer = replay.update_priorities(buffer, idx, td_err)
                else:
                    losses = (jnp.asarray(0.0), jnp.asarray(0.0),
                              jnp.exp(learner[3]))

                ep_rew = trk["ep_rew"] + rew_raw
                ep_len = trk["ep_len"] + 1
                out = dict(
                    done=done,
                    ep_rew_done=jnp.where(done, ep_rew, 0.0),
                    ep_len_done=jnp.where(done, ep_len, 0),
                    c_loss=losses[0], a_loss=losses[1], alpha=losses[2],
                )
                trk = dict(
                    ep_rew=jnp.where(done, 0.0, ep_rew),
                    ep_len=jnp.where(done, 0, ep_len),
                )
                return (learner, env_state, buffer, trk, key), out

            carry, outs = lax.scan(
                step_fn, (learner, env_state, buffer, trackers, key),
                None, length=self.steps_per_epoch,
            )
            return carry, outs

        self._train_epoch_seed = jax.jit(partial(train_epoch, seed_phase=True))
        self._train_epoch = jax.jit(partial(train_epoch, seed_phase=False))

    def _learner_tuple(self):
        return (self.actor_params, self.critic_params, self.target_critic_params,
                self.log_alpha, self.actor_opt_state, self.critic_opt_state,
                self.alpha_opt_state, self.obs_rms)

    def _set_learner_tuple(self, learner):
        (self.actor_params, self.critic_params, self.target_critic_params,
         self.log_alpha, self.actor_opt_state, self.critic_opt_state,
         self.alpha_opt_state, self.obs_rms) = learner

    # ---------------------------------------------------------------- train

    def train(self):
        self.start_time = time.time()
        self._best_snapshot = None
        self._last_best_write = 0.0
        tr = self.time_report
        tr.add_timer("algorithm")
        tr.start_timer("algorithm")

        # Pipelined epoch loop (same design + measurements as SHAC.train):
        # dispatch epoch k+1 BEFORE blocking on epoch k's stats so the
        # tunnel RTT + stats transfer + host bookkeeping overlap the next
        # epoch's device compute.
        pending = None
        self._t_last_epoch = time.time()
        for epoch in range(self.max_epochs):
            self.key, k = jax.random.split(self.key)
            fn = self._train_epoch_seed if epoch < self.num_seed_steps else self._train_epoch
            (learner, self.env_state, self.buffer, self.episode_trackers, _), outs = fn(
                self._learner_tuple(), self.env_state, self.buffer,
                self.episode_trackers, k,
            )
            self._set_learner_tuple(learner)
            snap = {
                "actor": self.actor_params,
                "critic": self.critic_params,
                "target_critic": self.target_critic_params,
                "log_alpha": self.log_alpha,
                "obs_rms": self.obs_rms,
            }
            if pending is not None:
                self._process_epoch_stats(*pending)
            pending = (outs, snap)
        if pending is not None:
            self._process_epoch_stats(*pending)

        tr.end_timer("algorithm")
        tr.report()
        if self._best_snapshot is not None:
            self.save("best_policy", snapshot=self._best_snapshot)
        self.save("final_policy")

    def _process_epoch_stats(self, outs, snap):
        """Host-side half of one epoch (runs while the next epoch's compute
        is in flight): one batched stats fetch, meters, best-policy
        snapshot, logging."""
        outs = jax.device_get(outs)
        self.iter_count += 1
        self.step_count += self.steps_per_epoch * self.num_envs
        done_np = np.asarray(outs["done"]).reshape(-1).astype(bool)
        if done_np.any():
            ep_rews = np.asarray(outs["ep_rew_done"]).reshape(-1)[done_np]
            ep_lens = np.asarray(outs["ep_len_done"]).reshape(-1)[done_np]
            self.episode_rew_meter.update(ep_rews)
            self.episode_length_meter.update(ep_lens)

        mean_rew = self.episode_rew_meter.get_mean()
        mean_len = self.episode_length_meter.get_mean()
        now = time.time()
        fps = self.steps_per_epoch * self.num_envs / (now - self._t_last_epoch)
        self._t_last_epoch = now

        if mean_rew > self.best_rew and self.episode_rew_meter.current_size > 0:
            self.best_rew = mean_rew
            self._best_snapshot = dict(
                snap, iter_count=self.iter_count, step_count=self.step_count)
            now = time.time()
            if now - self._last_best_write > 60.0:
                self.save(snapshot=self._best_snapshot)
                self._last_best_write = now

        self._log_scalars(
            rewards=mean_rew, episode_lengths=mean_len,
            c_loss=float(outs["c_loss"][-1]), a_loss=float(outs["a_loss"][-1]),
            alpha=float(outs["alpha"][-1]), fps=fps,
        )
        if self.iter_count % 10 == 0 or self.iter_count == 1:
            print(
                f"iter {self.iter_count}: rew {mean_rew:.2f}, ep len "
                f"{mean_len:.1f}, fps {fps:.0f}, alpha {float(outs['alpha'][-1]):.3f}"
            )
        if self.save_interval > 0 and self.iter_count % self.save_interval == 0:
            # carried epoch-k snapshot: self.*_params already belong to the
            # in-flight epoch k+1 under the pipelined loop
            self.save(f"{self.name}_iter{self.iter_count}",
                      snapshot=dict(snap, iter_count=self.iter_count,
                                    step_count=self.step_count))

    # ----------------------------------------------------------- evaluation

    def evaluate_policy(self, num_games, deterministic=True):
        """Batched device-side evaluation (eval_utils.batched_eval)."""
        from .eval_utils import batched_eval

        def act_fn(obs, k):
            obs_n = self.obs_rms.normalize(obs) if self.obs_rms is not None else obs
            if deterministic:
                return self.actor.mean_action(self.actor_params, obs_n)
            a, _ = self.actor.sample(self.actor_params, obs_n, k)
            return a

        mean_rew, _, mean_len = batched_eval(
            self.env, act_fn, jax.random.PRNGKey(self.seed + 1), num_games
        )
        return mean_rew, mean_len

    def run(self, num_games):
        mean_rew, mean_len = self.evaluate_policy(num_games)
        print_info(f"mean reward = {mean_rew}, mean episode length = {mean_len}")
        return mean_rew, mean_len

    def play(self, cfg):
        self.load(cfg["params"]["general"]["checkpoint"])
        games_num = cfg["params"]["config"].get("player", {}).get("games_num", 1)
        self.run(games_num)

    # ---------------------------------------------------------- checkpoints

    def _snapshot(self):
        return {
            "actor": self.actor_params,
            "critic": self.critic_params,
            "target_critic": self.target_critic_params,
            "log_alpha": self.log_alpha,
            "obs_rms": self.obs_rms,
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
        self.critic_params = as_jnp(state["critic"])
        self.target_critic_params = as_jnp(state["target_critic"])
        self.log_alpha = jnp.asarray(state["log_alpha"])
        if state.get("obs_rms") is not None:
            self.obs_rms = as_jnp(state["obs_rms"])
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
