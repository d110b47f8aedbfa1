"""PPO: proximal policy optimization baseline.

Fresh TPU-native implementation of the model-free baseline the reference
vendors via rl_games (/root/reference/externals/rl_games/rl_games/common/
a2c_common.py + algos_torch/a2c_continuous.py), scoped to what the
cfg/ppo/*.yaml configs exercise:

- no-grad rollout of `steps_num` x `num_actors` (play_steps, a2c_common.py:588)
  as one jitted ``lax.scan`` over the vmapped simulator;
- GAE(gamma, tau) with value bootstrap (discount_values, a2c_common.py:453);
- input + value normalization (RunningMeanStd), reward shaping scale;
- mini_epochs x minibatch clipped-surrogate updates with value clipping,
  bound loss, entropy bonus (calc_gradients, a2c_continuous.py:85-167);
- KL-adaptive learning rate (AdaptiveScheduler, rl_games common/schedulers.py:
  lr /= 1.5 if kl > 2*threshold, lr *= 1.5 if kl < 0.5*threshold, clamped to
  [1e-6, 1e-2]) — carried through the jitted update scan;
- multi-device: env axis sharded over a ``data`` mesh; the minibatch grad
  means become psums inserted by XLA (replaces Horovod, hvd_wrapper.py).

The whole epoch (rollout + GAE + all minibatch updates) is ONE jitted call.
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
from ..models import ActorCriticPPO
from ..models.builders import A2CNetwork
from ..utils import AverageMeter, RunningMeanStd, TimeReport, print_info
from ..utils.tb import TBWriter


class PPO:
    def __init__(self, cfg: Dict[str, Any], env=None):
        params = cfg["params"]
        general = params.get("general", {})
        config = params["config"]

        self.seed = general.get("seed", 0)
        if env is not None:
            self.env = env
        else:
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
        self.tau = config.get("tau", 0.95)
        self.steps_num = config.get("steps_num", 32)
        self.max_epochs = config.get("max_epochs", 5000)
        self.lr = float(config.get("learning_rate", 3e-4))
        self.lr_schedule = config.get("lr_schedule", "adaptive")
        self.kl_threshold = float(config.get("kl_threshold", 0.008))
        self.e_clip = config.get("e_clip", 0.2)
        self.clip_value = config.get("clip_value", True)
        self.critic_coef = config.get("critic_coef", 4.0)
        self.entropy_coef = config.get("entropy_coef", 0.0)
        self.bounds_loss_coef = config.get("bounds_loss_coef", 0.0001)
        self.grad_norm = config.get("grad_norm", 1.0)
        self.truncate_grads = config.get("truncate_grads", True)
        self.normalize_input = config.get("normalize_input", True)
        self.normalize_value = config.get("normalize_value", True)
        self.normalize_advantage = config.get("normalize_advantage", True)
        self.rew_scale = config.get("reward_shaper", {}).get("scale_value", 1.0)
        batch = self.num_envs * self.steps_num
        self.minibatch_size = min(config.get("minibatch_size", batch), batch)
        self.mini_epochs = config.get("mini_epochs", 5)
        self.name = config.get("name", "ppo")
        if batch % self.minibatch_size != 0:
            raise ValueError("minibatch_size must divide steps_num*num_actors")
        self.num_minibatches = batch // self.minibatch_size

        self.log_dir = general.get("logdir", "./logs")
        os.makedirs(self.log_dir, exist_ok=True)
        self.save_interval = config.get("save_frequency", 400)

        # Network selection: the validated dflex path uses the shared-trunk
        # continuous ActorCriticPPO; any cnn/rnn/discrete request in the
        # network tree switches to the config-driven A2CNetwork builder
        # (rl_games network_builder.py parity, models/builders.py)
        net_cfg = params.get("network", {})
        space = net_cfg.get("space", {})
        self.use_builder = (
            "discrete" in space or "multi_discrete" in space
            or "cnn" in net_cfg or "rnn" in net_cfg
        )
        if self.use_builder:
            obs_shape = getattr(self.env, "obs_shape", (self.num_obs,))
            self.network = A2CNetwork(
                obs_shape, self.num_actions, net_cfg,
                action_dims=getattr(self.env, "action_dims", None),
            )
            self.seq_length = int(config.get("seq_length", 4))
            if self.network.rnn_name and self.steps_num % self.seq_length:
                raise ValueError("seq_length must divide steps_num")
        else:
            self.network = ActorCriticPPO(
                self.num_obs, self.num_actions, net_cfg
            )
        key = jax.random.PRNGKey(self.seed)
        key, kn = jax.random.split(key)
        self.net_params = self.network.init(kn)
        self.key = key

        # adam with carried adaptive lr: transform without lr, scale manually
        self.opt = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-1.0),
        )
        self.opt_state = self.opt.init(self.net_params)
        self.cur_lr = jnp.asarray(self.lr, dtype=jnp.float32)

        obs_rms_shape = tuple(getattr(self.env, "obs_shape", (self.num_obs,)))
        self.obs_rms = RunningMeanStd.create(obs_rms_shape) if self.normalize_input else None
        self.val_rms = RunningMeanStd.create(()) if self.normalize_value else None

        self.env_state = self.env.reset(jax.random.PRNGKey(self.seed))
        self.episode_trackers = dict(
            ep_rew=jnp.zeros(self.num_envs),
            ep_len=jnp.zeros(self.num_envs, dtype=jnp.int32),
        )
        if self.use_builder and self.network.rnn_name:
            self.episode_trackers["rnn"] = self.network.initial_rnn_state(
                (self.num_envs,)
            )

        # reference `multi_gpu: True` parity (cfg/ppo/ant.yaml:45 engages
        # Horovod; here the env axis shards over a data mesh instead)
        self.mesh = None
        if config.get("multi_gpu", False):
            self.shard_over_mesh()

        self.iter_count = 0
        self.step_count = 0
        self.episode_rew_meter = AverageMeter(1, 100)
        self.episode_length_meter = AverageMeter(1, 100)
        self.best_rew = -np.inf
        self.time_report = TimeReport()
        self.scalars: Dict[str, list] = {}
        self.writer = TBWriter(os.path.join(self.log_dir, "log"))

        self._build_jitted_fns()

    def shard_over_mesh(self, num_devices=None):
        """Shard the env axis over a ``data`` mesh; replicate learner state
        (TPU-native replacement for the Horovod DistributedOptimizer)."""
        from ..parallel import mesh as mesh_lib

        self.mesh = mesh_lib.make_data_mesh(num_devices)
        if self.num_envs % self.mesh.size:
            raise ValueError(
                f"num_envs={self.num_envs} not divisible by mesh size {self.mesh.size}"
            )
        self.env_state = mesh_lib.shard_env_axis(self.mesh, self.env_state, self.num_envs)
        self.episode_trackers = mesh_lib.shard_env_axis(self.mesh, self.episode_trackers, self.num_envs)
        for attr in ("net_params", "opt_state", "obs_rms", "val_rms"):
            v = getattr(self, attr)
            if v is not None:
                setattr(self, attr, mesh_lib.replicate(self.mesh, v))

    # ------------------------------------------------------------------ jit

    def _build_jitted_fns(self):
        if self.use_builder:
            self._build_jitted_fns_builder()
            return
        env = self.env
        net = self.network
        H = self.steps_num
        gamma, tau = self.gamma, self.tau

        def norm_obs(obs_rms, o):
            return obs_rms.normalize(o) if obs_rms is not None else o

        def norm_val(val_rms, v, un=False):
            return val_rms.normalize(v, un_norm=un) if val_rms is not None else v

        def play_steps(net_params, env_state, obs_rms, val_rms, trackers, key):
            obs = env.batch_observations(env_state)
            obs = lax.stop_gradient(obs)
            rms_frozen = obs_rms

            def step_fn(carry, _):
                env_state, obs, obs_rms, trk, key = carry
                obs_n = norm_obs(rms_frozen, obs)
                mu, sigma, value = net(net_params, obs_n)
                key, k = jax.random.split(key)
                actions = mu + sigma * jax.random.normal(k, mu.shape)
                logp = net.log_prob(mu, sigma, actions)

                env_state, obs_next, rew_raw, done, info = env.step(
                    env_state, jnp.clip(actions, -1.0, 1.0)
                )
                rew = rew_raw * self.rew_scale

                if obs_rms is not None:
                    obs_rms = obs_rms.update(obs_next)

                # value bootstrap on time-limit truncation (rl_games
                # use_smooth_clamp/bootstrap path is off for dflex; plain GAE)
                ep_rew = trk["ep_rew"] + rew_raw
                ep_len = trk["ep_len"] + 1
                out = dict(
                    obs=obs_n,
                    actions=actions,
                    logp=logp,
                    mu=mu,
                    sigma=jnp.broadcast_to(sigma, mu.shape),
                    value=norm_val(val_rms, value, un=True),
                    rew=rew,
                    done=done.astype(jnp.float32),
                    ep_rew_done=jnp.where(done, ep_rew, 0.0),
                    ep_len_done=jnp.where(done, ep_len, 0),
                )
                trk = dict(
                    ep_rew=jnp.where(done, 0.0, ep_rew),
                    ep_len=jnp.where(done, 0, ep_len),
                )
                return (env_state, obs_next, obs_rms, trk, key), out

            (env_state, last_obs, obs_rms, trackers, key), outs = lax.scan(
                step_fn, (env_state, obs, obs_rms, trackers, key), None, length=H
            )

            last_obs_n = norm_obs(rms_frozen, last_obs)
            _, _, last_value = net(net_params, last_obs_n)
            last_value = norm_val(val_rms, last_value, un=True)
            return env_state, obs_rms, trackers, key, outs, last_value

        def gae(rews, dones, values, last_value):
            """GAE backward scan (discount_values, a2c_common.py:453-463)."""
            def back(carry, xs):
                adv = carry
                rew, done, value, next_value = xs
                nonterminal = 1.0 - done
                delta = rew + gamma * next_value * nonterminal - value
                adv = delta + gamma * tau * nonterminal * adv
                return adv, adv

            next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
            _, advs = lax.scan(
                back, jnp.zeros_like(last_value),
                (rews, dones, values, next_values), reverse=True,
            )
            return advs

        def minibatch_loss(net_params, lr_unused, obs, actions, old_logp,
                           advantages, returns, old_values, old_mu, old_sigma):
            mu, sigma, value = net(net_params, obs)
            logp = net.log_prob(mu, sigma, actions)

            ratio = jnp.exp(logp - old_logp)
            surr1 = advantages * ratio
            surr2 = advantages * jnp.clip(ratio, 1.0 - self.e_clip, 1.0 + self.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()

            if self.clip_value:
                v_clipped = old_values + jnp.clip(
                    value - old_values, -self.e_clip, self.e_clip
                )
                v_loss1 = (value - returns) ** 2
                v_loss2 = (v_clipped - returns) ** 2
                c_loss = jnp.maximum(v_loss1, v_loss2).mean()
            else:
                c_loss = ((value - returns) ** 2).mean()

            # bound loss (a2c_continuous.py:bound_loss, soft bound 1.1)
            b_loss = (
                jnp.maximum(mu - 1.1, 0.0) ** 2 + jnp.maximum(-1.1 - mu, 0.0) ** 2
            ).sum(axis=-1).mean()

            entropy = net.entropy(sigma).mean()

            loss = (
                a_loss
                + 0.5 * c_loss * self.critic_coef
                - self.entropy_coef * entropy
                + self.bounds_loss_coef * b_loss
            )
            # analytic Gaussian KL(old || new) for the adaptive LR scheduler
            # (rl_games torch_utils.policy_kl semantics)
            sig_new = jnp.broadcast_to(sigma, mu.shape)
            kl = jnp.mean(
                jnp.sum(
                    jnp.log(sig_new / old_sigma)
                    + (old_sigma**2 + (mu - old_mu) ** 2) / (2.0 * sig_new**2)
                    - 0.5,
                    axis=-1,
                )
            )
            return loss, (a_loss, c_loss, entropy, kl)

        def train_epoch(net_params, opt_state, cur_lr, env_state,
                        obs_rms, val_rms, trackers, key):
            (env_state, obs_rms, trackers, key, outs, last_value) = play_steps(
                net_params, env_state, obs_rms, val_rms, trackers, key
            )

            advs = gae(outs["rew"], outs["done"], outs["value"], last_value)
            returns = advs + outs["value"]

            if val_rms is not None:
                val_rms = val_rms.update(returns)
                values_n = val_rms.normalize(outs["value"])
                returns_n = val_rms.normalize(returns)
            else:
                values_n = outs["value"]
                returns_n = returns

            B = H * self.num_envs
            obs_f = outs["obs"].reshape(B, -1)
            act_f = outs["actions"].reshape(B, -1)
            logp_f = outs["logp"].reshape(B)
            adv_f = advs.reshape(B)
            ret_f = returns_n.reshape(B)
            val_f = values_n.reshape(B)
            mu_f = outs["mu"].reshape(B, -1)
            sig_f = outs["sigma"].reshape(B, -1)

            if self.normalize_advantage:
                adv_f = (adv_f - adv_f.mean()) / (adv_f.std() + 1e-8)

            mb = self.minibatch_size
            nmb = self.num_minibatches

            def one_minibatch(carry, idx):
                net_params, opt_state, lr, _ = carry
                o = obs_f[idx]
                a = act_f[idx]
                lp = logp_f[idx]
                ad = adv_f[idx]
                rt = ret_f[idx]
                vl = val_f[idx]
                om = mu_f[idx]
                osg = sig_f[idx]
                (loss, (a_l, c_l, ent, kl)), grads = jax.value_and_grad(
                    minibatch_loss, has_aux=True
                )(net_params, lr, o, a, lp, ad, rt, vl, om, osg)
                if self.truncate_grads:
                    gn = optax.global_norm(grads)
                    scale = jnp.minimum(1.0, self.grad_norm / (gn + 1e-12))
                    grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = self.opt.update(grads, opt_state, net_params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                net_params = optax.apply_updates(net_params, updates)

                # adaptive KL lr (rl_games AdaptiveScheduler)
                if self.lr_schedule == "adaptive":
                    lr = jnp.where(kl > 2.0 * self.kl_threshold,
                                   jnp.maximum(lr / 1.5, 1e-6), lr)
                    lr = jnp.where(kl < 0.5 * self.kl_threshold,
                                   jnp.minimum(lr * 1.5, 1e-2), lr)
                return (net_params, opt_state, lr, kl), (loss, a_l, c_l, kl)

            def one_epoch(carry, key_e):
                perm = jax.random.permutation(key_e, B)
                idxs = perm.reshape(nmb, mb)
                carry, stats = lax.scan(one_minibatch, carry, idxs)
                return carry, stats

            key, k_perm = jax.random.split(key)
            perm_keys = jax.random.split(k_perm, self.mini_epochs)
            (net_params, opt_state, cur_lr, last_kl), stats = lax.scan(
                one_epoch, (net_params, opt_state, cur_lr, jnp.asarray(0.0)),
                perm_keys,
            )

            aux = dict(
                env_state=env_state, obs_rms=obs_rms, val_rms=val_rms,
                trackers=trackers, key=key,
                ep_rew_done=outs["ep_rew_done"], ep_len_done=outs["ep_len_done"],
                done=outs["done"],
                loss=stats[0].mean(), a_loss=stats[1].mean(),
                c_loss=stats[2].mean(), kl=last_kl,
            )
            return net_params, opt_state, cur_lr, aux

        self._train_epoch = jax.jit(train_epoch)

    def _build_jitted_fns_builder(self):
        """Head-generic train path for A2CNetwork policies: categorical /
        multi-categorical heads, CNN trunks, and LSTM/GRU recurrence with
        rl_games-style sequence-chunked minibatches (a2c_common.py rnn path:
        seq_length chunks, hidden state saved at chunk starts, zeroed on
        done)."""
        env = self.env
        net = self.network
        H = self.steps_num
        gamma, tau = self.gamma, self.tau
        has_rnn = bool(net.rnn_name)
        seq = self.seq_length if has_rnn else 1
        continuous = net.space == "continuous"

        def norm_obs(obs_rms, o):
            return obs_rms.normalize(o) if obs_rms is not None else o

        def norm_val(val_rms, v, un=False):
            return val_rms.normalize(v, un_norm=un) if val_rms is not None else v

        def mask_hidden(rnn_state, done):
            return jax.tree.map(
                lambda h: jnp.where(done[:, None], 0.0, h), rnn_state
            )

        def play_steps(net_params, env_state, obs_rms, val_rms, trackers, key):
            obs = lax.stop_gradient(env.batch_observations(env_state))
            rms_frozen = obs_rms

            def step_fn(carry, _):
                env_state, obs, obs_rms, trk, key = carry
                rnn_state = trk.get("rnn")
                obs_n = norm_obs(rms_frozen, obs)
                head, value, new_rnn = net.apply(net_params, obs_n, rnn_state)
                key, k = jax.random.split(key)
                actions = net.sample(k, head)
                logp = net.log_prob(head, actions)
                a_env = jnp.clip(actions, -1.0, 1.0) if continuous else actions

                env_state, obs_next, rew_raw, done, info = env.step(env_state, a_env)
                rew = rew_raw * self.rew_scale
                if obs_rms is not None:
                    obs_rms = obs_rms.update(obs_next)

                ep_rew = trk["ep_rew"] + rew_raw
                ep_len = trk["ep_len"] + 1
                out = dict(
                    obs=obs_n, actions=actions, logp=logp, head=head,
                    value=norm_val(val_rms, value, un=True),
                    rew=rew, done=done.astype(jnp.float32),
                    ep_rew_done=jnp.where(done, ep_rew, 0.0),
                    ep_len_done=jnp.where(done, ep_len, 0),
                )
                new_trk = dict(
                    ep_rew=jnp.where(done, 0.0, ep_rew),
                    ep_len=jnp.where(done, 0, ep_len),
                )
                if has_rnn:
                    out["rnn"] = rnn_state  # PRE-step state, for chunk init
                    new_trk["rnn"] = mask_hidden(new_rnn, done)
                return (env_state, obs_next, obs_rms, new_trk, key), out

            (env_state, last_obs, obs_rms, trackers, key), outs = lax.scan(
                step_fn, (env_state, obs, obs_rms, trackers, key), None, length=H
            )
            _, last_value, _ = net.apply(
                net_params, norm_obs(rms_frozen, last_obs), trackers.get("rnn")
            )
            last_value = norm_val(val_rms, last_value, un=True)
            return env_state, obs_rms, trackers, key, outs, last_value

        def gae(rews, dones, values, last_value):
            def back(adv, xs):
                rew, done, value, next_value = xs
                nonterminal = 1.0 - done
                delta = rew + gamma * next_value * nonterminal - value
                adv = delta + gamma * tau * nonterminal * adv
                return adv, adv

            next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
            _, advs = lax.scan(back, jnp.zeros_like(last_value),
                               (rews, dones, values, next_values), reverse=True)
            return advs

        def surrogate_losses(head, value, batch):
            logp = net.log_prob(head, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            surr1 = batch["adv"] * ratio
            surr2 = batch["adv"] * jnp.clip(ratio, 1.0 - self.e_clip, 1.0 + self.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()

            if self.clip_value:
                v_clipped = batch["value"] + jnp.clip(
                    value - batch["value"], -self.e_clip, self.e_clip)
                c_loss = jnp.maximum((value - batch["ret"]) ** 2,
                                     (v_clipped - batch["ret"]) ** 2).mean()
            else:
                c_loss = ((value - batch["ret"]) ** 2).mean()

            b_loss = 0.0
            if continuous:
                mu = head[0]
                b_loss = (jnp.maximum(mu - 1.1, 0.0) ** 2
                          + jnp.maximum(-1.1 - mu, 0.0) ** 2).sum(axis=-1).mean()
            entropy = net.entropy(head).mean()
            kl = net.kl(batch["head"], head)
            loss = (a_loss + 0.5 * c_loss * self.critic_coef
                    - self.entropy_coef * entropy
                    + self.bounds_loss_coef * b_loss)
            return loss, (a_loss, c_loss, entropy, kl)

        def minibatch_loss(net_params, batch):
            if not has_rnn:
                head, value, _ = net.apply(net_params, batch["obs"])
                return surrogate_losses(head, value, batch)

            # sequence chunk: batch arrays are [mb, seq, ...]; scan over time
            # with the stored chunk-start hidden, zeroing on done
            def step(rnn_state, xs):
                obs_t, done_t = xs
                head_t, value_t, new_rnn = net.apply(net_params, obs_t, rnn_state)
                return mask_hidden(new_rnn, done_t.astype(bool)), (head_t, value_t)

            obs_t = jnp.moveaxis(batch["obs"], 1, 0)        # [seq, mb, ...]
            done_t = jnp.moveaxis(batch["done"], 1, 0)
            _, (head_seq, value_seq) = lax.scan(step, batch["rnn"], (obs_t, done_t))
            head = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), head_seq)
            value = jnp.moveaxis(value_seq, 0, 1)
            return surrogate_losses(head, value, batch)

        def train_epoch(net_params, opt_state, cur_lr, env_state,
                        obs_rms, val_rms, trackers, key):
            (env_state, obs_rms, trackers, key, outs, last_value) = play_steps(
                net_params, env_state, obs_rms, val_rms, trackers, key)

            advs = gae(outs["rew"], outs["done"], outs["value"], last_value)
            returns = advs + outs["value"]
            if val_rms is not None:
                val_rms = val_rms.update(returns)
                values_n = val_rms.normalize(outs["value"])
                returns_n = val_rms.normalize(returns)
            else:
                values_n, returns_n = outs["value"], returns
            if self.normalize_advantage:
                advs = (advs - advs.mean()) / (advs.std() + 1e-8)

            E = self.num_envs
            data = dict(obs=outs["obs"], actions=outs["actions"],
                        logp=outs["logp"], head=outs["head"], adv=advs,
                        ret=returns_n, value=values_n, done=outs["done"])
            if has_rnn:
                # [H, E, ...] -> [(H/seq)*E chunks, seq, ...]
                def chunk(x):
                    x = x.reshape((H // seq, seq, E) + x.shape[2:])
                    x = jnp.moveaxis(x, 2, 1)   # [H/seq, E, seq, ...]
                    return x.reshape((H // seq * E, seq) + x.shape[3:])
                data = jax.tree.map(chunk, data)
                # chunk-start hidden, same (time-chunk, env) flat order
                data["rnn"] = jax.tree.map(
                    lambda x: x.reshape((H // seq, seq, E) + x.shape[2:])[:, 0]
                    .reshape((H // seq * E,) + x.shape[2:]),
                    outs["rnn"],
                )
                B = H // seq * E
                mb = max(1, self.minibatch_size // seq)
            else:
                data = jax.tree.map(
                    lambda x: x.reshape((H * E,) + x.shape[2:]), data)
                B = H * E
                mb = self.minibatch_size
            nmb = max(1, B // mb)

            def one_minibatch(carry, idx):
                net_params, opt_state, lr, _ = carry
                batch = jax.tree.map(lambda x: x[idx], data)
                (loss, (a_l, c_l, ent, kl)), grads = jax.value_and_grad(
                    minibatch_loss, has_aux=True)(net_params, batch)
                if self.truncate_grads:
                    gn = optax.global_norm(grads)
                    scale = jnp.minimum(1.0, self.grad_norm / (gn + 1e-12))
                    grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = self.opt.update(grads, opt_state, net_params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                net_params = optax.apply_updates(net_params, updates)
                if self.lr_schedule == "adaptive":
                    lr = jnp.where(kl > 2.0 * self.kl_threshold,
                                   jnp.maximum(lr / 1.5, 1e-6), lr)
                    lr = jnp.where(kl < 0.5 * self.kl_threshold,
                                   jnp.minimum(lr * 1.5, 1e-2), lr)
                return (net_params, opt_state, lr, kl), (loss, a_l, c_l, kl)

            def one_epoch(carry, key_e):
                perm = jax.random.permutation(key_e, B)
                idxs = perm[: nmb * mb].reshape(nmb, mb)
                return lax.scan(one_minibatch, carry, idxs)

            key, k_perm = jax.random.split(key)
            perm_keys = jax.random.split(k_perm, self.mini_epochs)
            (net_params, opt_state, cur_lr, last_kl), stats = lax.scan(
                one_epoch, (net_params, opt_state, cur_lr, jnp.asarray(0.0)),
                perm_keys)

            aux = dict(
                env_state=env_state, obs_rms=obs_rms, val_rms=val_rms,
                trackers=trackers, key=key,
                ep_rew_done=outs["ep_rew_done"], ep_len_done=outs["ep_len_done"],
                done=outs["done"],
                loss=stats[0].mean(), a_loss=stats[1].mean(),
                c_loss=stats[2].mean(), kl=last_kl,
            )
            return net_params, opt_state, cur_lr, aux

        self._train_epoch = jax.jit(train_epoch)

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
        # epoch's device compute. Also folds cur_lr into the one batched
        # stats fetch — float(self.cur_lr) in the log call was paying an
        # extra device sync per epoch.
        pending = None
        self._t_last_epoch = time.time()
        for epoch in range(self.max_epochs):
            self.key, k = jax.random.split(self.key)
            (self.net_params, self.opt_state, self.cur_lr, aux) = self._train_epoch(
                self.net_params, self.opt_state, self.cur_lr, self.env_state,
                self.obs_rms, self.val_rms, self.episode_trackers, k,
            )
            self.env_state = aux["env_state"]
            self.obs_rms = aux["obs_rms"]
            self.val_rms = aux["val_rms"]
            self.episode_trackers = aux["trackers"]

            # ONLY the stats the host reads (aux also carries env_state/
            # rms/trackers — megabytes at 4096 envs the loop never touches)
            stats = {k: aux[k] for k in ("done", "ep_rew_done", "ep_len_done",
                                         "loss", "a_loss", "c_loss", "kl")}
            stats["cur_lr"] = self.cur_lr
            snap = {
                "net": self.net_params,
                "obs_rms": self.obs_rms,
                "val_rms": self.val_rms,
                "opt_state": self.opt_state,
                "cur_lr": self.cur_lr,
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

    def _process_epoch_stats(self, stats, snap):
        """Host-side half of one epoch (runs while the next epoch's compute
        is in flight): one batched stats fetch, meters, best-policy
        snapshot, logging."""
        aux = jax.device_get(stats)
        self.iter_count += 1
        self.step_count += self.steps_num * self.num_envs
        done_np = np.asarray(aux["done"]).reshape(-1).astype(bool)
        if done_np.any():
            ep_rews = np.asarray(aux["ep_rew_done"]).reshape(-1)[done_np]
            ep_lens = np.asarray(aux["ep_len_done"]).reshape(-1)[done_np]
            self.episode_rew_meter.update(ep_rews)
            self.episode_length_meter.update(ep_lens)

        mean_rew = self.episode_rew_meter.get_mean()
        mean_len = self.episode_length_meter.get_mean()
        now = time.time()
        fps = self.steps_num * self.num_envs / (now - self._t_last_epoch)
        self._t_last_epoch = now

        if mean_rew > self.best_rew and self.episode_rew_meter.current_size > 0:
            self.best_rew = mean_rew
            self._best_snapshot = dict(
                snap, iter_count=self.iter_count, step_count=self.step_count)
            now = time.time()
            if now - self._last_best_write > 60.0:
                self.save(snapshot=self._best_snapshot)
                self._last_best_write = now

        cur_lr = float(aux["cur_lr"])
        self._log_scalars(
            rewards=mean_rew, episode_lengths=mean_len,
            loss=float(aux["loss"]), a_loss=float(aux["a_loss"]),
            c_loss=float(aux["c_loss"]), kl=float(aux["kl"]),
            lr=cur_lr, fps=fps,
        )
        if self.iter_count % 10 == 0 or self.iter_count == 1:
            print(
                f"iter {self.iter_count}: rew {mean_rew:.2f}, "
                f"ep len {mean_len:.1f}, fps {fps:.0f}, kl {float(aux['kl']):.4f}, "
                f"lr {cur_lr:.2e}"
            )
        if self.save_interval > 0 and self.iter_count % self.save_interval == 0:
            # carried epoch-k snapshot: self.net_params already belong to the
            # in-flight epoch k+1 under the pipelined loop
            self.save(f"{self.name}_iter{self.iter_count}",
                      snapshot=dict(snap, iter_count=self.iter_count,
                                    step_count=self.step_count))

    # ----------------------------------------------------------- evaluation

    def evaluate_policy(self, num_games, deterministic=True):
        """Batched device-side evaluation (eval_utils.batched_eval)."""
        from .eval_utils import batched_eval

        if self.use_builder:
            return self._evaluate_builder(num_games, deterministic)

        def act_fn(obs, k):
            obs_n = self.obs_rms.normalize(obs) if self.obs_rms is not None else obs
            mu, sigma, _ = self.network(self.net_params, obs_n)
            a = mu if deterministic else mu + sigma * jax.random.normal(k, mu.shape)
            return jnp.clip(a, -1, 1)

        mean_rew, _, mean_len = batched_eval(
            self.env, act_fn, jax.random.PRNGKey(self.seed + 1), num_games
        )
        return mean_rew, mean_len

    def _evaluate_builder(self, num_games, deterministic=True):
        """Jitted eval rollout for A2CNetwork policies (carries RNN state,
        handles categorical heads: greedy argmax when deterministic)."""
        env, net = self.env, self.network
        steps = env.episode_length

        @jax.jit
        def rollout(net_params, obs_rms, env_state, key):
            def body(carry, _):
                env_state, rnn, key, ep_rew, done_seen = carry
                obs = env.batch_observations(env_state)
                obs_n = obs_rms.normalize(obs) if obs_rms is not None else obs
                head, _, rnn = net.apply(net_params, obs_n, rnn)
                key, k = jax.random.split(key)
                if net.space == "continuous":
                    mu, sigma = head
                    a = mu if deterministic else mu + sigma * jax.random.normal(k, mu.shape)
                    a = jnp.clip(a, -1.0, 1.0)
                elif deterministic:
                    if net.space == "discrete":
                        a = jnp.argmax(head, axis=-1)
                    else:
                        a = jnp.stack([jnp.argmax(lg, axis=-1) for lg in head], -1)
                else:
                    a = net.sample(k, head)
                env_state, _, rew, done, _ = env.step(env_state, a)
                ep_rew = ep_rew + rew * (1.0 - done_seen)
                done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
                if net.rnn_name:
                    rnn = jax.tree.map(
                        lambda h: jnp.where(done[:, None], 0.0, h), rnn)
                return (env_state, rnn, key, ep_rew, done_seen), done_seen

            rnn0 = net.initial_rnn_state((env.num_envs,))
            init = (env_state, rnn0, key, jnp.zeros(env.num_envs),
                    jnp.zeros(env.num_envs))
            (_, _, _, ep_rew, _), done_seen = lax.scan(body, init, None, length=steps)
            ep_len = jnp.sum(1.0 - done_seen, axis=0)
            return ep_rew, ep_len

        env_state = env.reset(jax.random.PRNGKey(self.seed + 1))
        ep_rew, ep_len = rollout(self.net_params, self.obs_rms, env_state,
                                 jax.random.PRNGKey(self.seed + 2))
        return float(jnp.mean(ep_rew)), float(jnp.mean(ep_len))

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
            "net": self.net_params,
            "obs_rms": self.obs_rms,
            "val_rms": self.val_rms,
            "opt_state": self.opt_state,
            "cur_lr": self.cur_lr,
            "iter_count": self.iter_count,
            "step_count": self.step_count,
        }

    def save(self, filename=None, snapshot=None):
        filename = filename or "best_policy"
        state = jax.device_get(snapshot if snapshot is not None else self._snapshot())
        state["cur_lr"] = float(state["cur_lr"])
        with open(os.path.join(self.log_dir, f"{filename}.pkl"), "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        with open(path, "rb") as f:
            state = pickle.load(f)
        as_jnp = partial(jax.tree.map, jnp.asarray)
        self.net_params = as_jnp(state["net"])
        if state.get("obs_rms") is not None:
            self.obs_rms = as_jnp(state["obs_rms"])
        if state.get("val_rms") is not None:
            self.val_rms = as_jnp(state["val_rms"])
        self.opt_state = as_jnp(state["opt_state"])
        self.cur_lr = jnp.asarray(state.get("cur_lr", self.lr), dtype=jnp.float32)
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
