"""SAC fine-tuning (parity: `agent/finetune/train_sac_agent.py:70`, 335 LoC):
one (or few) env macro-steps per iteration with FIFO replay, a uniform
random exploration phase for the first `n_explore_steps` iterations,
truncation bootstrap via `info["final_obs"]`, critic updates every
`batch_size / critic_replay_ratio` iterations with Polyak targets, delayed
actor + temperature updates (2 inner steps) every
`batch_size / actor_replay_ratio` iterations, eval runs until
`n_eval_episode` episodes finish."""

from __future__ import annotations

import logging
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import TrainAgent
from dppo_tpu.utils.replay import (
    ReplayState,
    replay_init,
    replay_insert,
    replay_sample_indices,
)
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class SACTrainState(NamedTuple):
    params: Any  # SACParams (actor, critic, critic_target, log_alpha)
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any


class TrainSACAgent(TrainAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gamma = float(cfg.train.gamma)
        self.target_ema_rate = float(cfg.train.target_ema_rate)
        self.scale_reward_factor = float(cfg.train.scale_reward_factor)
        # Cal-QL cfgs carry no replay ratios (reference schema: its update
        # cadence is num_update per iteration, `_should_update` is
        # overridden) — default to updating every iteration
        self.critic_update_freq = max(
            1,
            int(
                cfg.train.batch_size
                / cfg.train.get("critic_replay_ratio", cfg.train.batch_size)
            ),
        )
        self.actor_update_freq = max(
            1,
            int(
                cfg.train.batch_size
                / cfg.train.get("actor_replay_ratio", cfg.train.batch_size)
            ),
        )
        self.buffer_size = int(cfg.train.buffer_size)
        self.n_eval_episode = int(cfg.train.n_eval_episode)
        self.n_explore_steps = int(cfg.train.n_explore_steps)
        self.target_entropy = float(cfg.train.target_entropy)
        init_temperature = float(cfg.train.init_temperature)

        self.actor_optimizer = optax.adam(float(cfg.train.actor_lr))
        self.critic_optimizer = optax.adam(float(cfg.train.critic_lr))
        self.alpha_optimizer = optax.adam(float(cfg.train.critic_lr))

        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        example_action = jnp.zeros(
            (self.n_envs, self.act_steps, self.action_dim)
        )
        params = self._init_model_params(cond, example_action, init_temperature)
        log_alpha = getattr(params, "log_alpha", jnp.zeros(()))
        self.state = SACTrainState(
            params,
            self.actor_optimizer.init(params.actor),
            self.critic_optimizer.init(self._critic_leaf(params)),
            self.alpha_optimizer.init(log_alpha),
        )
        self.replay = replay_init(
            self.buffer_size,
            {
                "obs": np.zeros((self.n_cond_step, self.obs_dim), np.float32),
                "next_obs": np.zeros(
                    (self.n_cond_step, self.obs_dim), np.float32
                ),
                "actions": np.zeros(
                    (self.act_steps, self.action_dim), np.float32
                ),
                "rewards": np.zeros((), np.float32),
                "terminated": np.zeros((), np.float32),
            },
        )
        self._jit_insert = jax.jit(replay_insert)
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_critic_update = jax.jit(self._critic_update)
        self._jit_actor_update = jax.jit(self._actor_update)

    # --- hooks that CalQL/RLPD/IBRL subclasses specialize ---
    def _init_model_params(self, cond, example_action, init_temperature):
        return self.model.init_sac_params(
            self.next_rng(), cond, example_action, init_temperature
        )

    def _critic_leaf(self, params):
        return params.critic

    def _critic_update(self, state: SACTrainState, replay: ReplayState, rng):
        model = self.model
        r_idx, r_loss = jax.random.split(rng)
        inds = replay_sample_indices(r_idx, replay, self.batch_size)
        obs_b = {"state": replay.data["obs"][inds]}
        next_obs_b = {"state": replay.data["next_obs"][inds]}
        alpha = jnp.exp(state.params.log_alpha)
        loss_critic, grads = jax.value_and_grad(model.loss_critic)(
            self._critic_leaf(state.params),
            state.params,
            obs_b,
            next_obs_b,
            replay.data["actions"][inds],
            replay.data["rewards"][inds],
            replay.data["terminated"][inds],
            self.gamma,
            alpha,
            r_loss,
        )
        updates, critic_opt = self.critic_optimizer.update(
            grads, state.critic_opt, self._critic_leaf(state.params)
        )
        new_critic = optax.apply_updates(
            self._critic_leaf(state.params), updates
        )
        params = self._set_critic_leaf(state.params, new_critic)
        params = model.update_target_critic(params, self.target_ema_rate)
        return state._replace(params=params, critic_opt=critic_opt), loss_critic

    def _set_critic_leaf(self, params, new_critic):
        return params._replace(critic=new_critic)

    def _actor_update(self, state: SACTrainState, replay: ReplayState, rng):
        model = self.model

        def one(carry, sub):
            state = carry
            r_idx, r_actor, r_alpha = jax.random.split(sub, 3)
            inds = replay_sample_indices(r_idx, replay, self.batch_size)
            obs_b = {"state": replay.data["obs"][inds]}
            alpha = jnp.exp(state.params.log_alpha)
            loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
                state.params.actor, state.params, obs_b, alpha, r_actor
            )
            a_updates, actor_opt = self.actor_optimizer.update(
                a_grads, state.actor_opt, state.params.actor
            )
            params = state.params._replace(
                actor=optax.apply_updates(state.params.actor, a_updates)
            )
            loss_alpha, al_grads = jax.value_and_grad(model.loss_temperature)(
                params.log_alpha, params, obs_b, self.target_entropy, r_alpha
            )
            al_updates, alpha_opt = self.alpha_optimizer.update(
                al_grads, state.alpha_opt, params.log_alpha
            )
            params = params._replace(
                log_alpha=optax.apply_updates(params.log_alpha, al_updates)
            )
            return (
                state._replace(
                    params=params, actor_opt=actor_opt, alpha_opt=alpha_opt
                ),
                loss_actor,
            )

        state, losses = jax.lax.scan(one, state, jax.random.split(rng, 2))
        return state, losses.mean()

    def _random_actions(self):
        return np.random.uniform(
            -1, 1, size=(self.n_envs, self.act_steps, self.action_dim)
        ).astype(np.float32)

    def _insert_transitions(
        self, prev_obs_venv, action_venv, obs_venv, reward_venv,
        terminated_venv, truncated_venv, info_venv,
    ):
        next_state = obs_venv["state"].copy()
        for i in range(self.n_envs):
            if truncated_venv[i] and "final_obs" in info_venv[i]:
                next_state[i] = info_venv[i]["final_obs"]["state"]
        self.replay = self._jit_insert(
            self.replay,
            {
                "obs": jnp.asarray(prev_obs_venv["state"], jnp.float32),
                "next_obs": jnp.asarray(next_state, jnp.float32),
                "actions": jnp.asarray(action_venv, jnp.float32),
                "rewards": jnp.asarray(
                    reward_venv * self.scale_reward_factor, jnp.float32
                ),
                "terminated": jnp.asarray(
                    terminated_venv.astype(np.float32)
                ),
            },
        )

    def _should_update(self):
        return (
            self.itr > self.n_explore_steps
            and self.itr % self.critic_update_freq == 0
        )

    def _do_updates(self) -> dict:
        diag = {}
        self.state, loss_critic = self._jit_critic_update(
            self.state, self.replay, self.next_rng()
        )
        diag["loss_critic"] = float(loss_critic)
        if self.itr % self.actor_update_freq == 0:
            self.state, loss_actor = self._jit_actor_update(
                self.state, self.replay, self.next_rng()
            )
            diag["loss_actor"] = float(loss_actor)
        diag["alpha"] = float(jnp.exp(self.state.params.log_alpha))
        return diag

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        done_venv = np.zeros(self.n_envs, dtype=bool)
        prev_obs_venv = None
        while self.itr < self.n_train_itr:
            options_venv = [{} for _ in range(self.n_envs)]
            eval_mode = (
                self.itr % self.val_freq == 0
                and self.itr > self.n_explore_steps
                and not self.force_train
            )
            n_steps = self.n_steps if not eval_mode else int(1e5)
            firsts_trajs = np.zeros((self.n_steps + 1, self.n_envs))
            if self.reset_at_iteration or eval_mode or prev_obs_venv is None:
                prev_obs_venv = self.reset_env_all(options_venv=options_venv)
                firsts_trajs[0] = 1
            else:
                firsts_trajs[0] = done_venv
            reward_trajs_l = []
            cnt_episode = 0
            for step in range(n_steps):
                if self.itr < self.n_explore_steps:
                    action_venv = self._random_actions()
                else:
                    cond = {
                        "state": jnp.asarray(
                            prev_obs_venv["state"], jnp.float32
                        )
                    }
                    samples = np.asarray(
                        self._jit_sample(
                            self.state.params, cond, self.next_rng(), eval_mode
                        )
                    )
                    action_venv = samples[:, : self.act_steps]
                obs_venv, reward_venv, terminated_venv, truncated_venv, info_venv = (
                    self.venv.step(action_venv)
                )
                done_venv = terminated_venv | truncated_venv
                reward_trajs_l.append(reward_venv)
                if step + 1 <= self.n_steps:
                    firsts_trajs_idx = min(step + 1, self.n_steps)
                    firsts_trajs[firsts_trajs_idx] = done_venv
                if not eval_mode:
                    self._insert_transitions(
                        prev_obs_venv, action_venv, obs_venv, reward_venv,
                        terminated_venv, truncated_venv, info_venv,
                    )
                prev_obs_venv = obs_venv
                cnt_train_step += (
                    self.n_envs * self.act_steps if not eval_mode else 0
                )
                cnt_episode += int(np.sum(done_venv))
                if eval_mode and cnt_episode >= self.n_eval_episode:
                    break

            reward_trajs = np.stack(reward_trajs_l) if reward_trajs_l else (
                np.zeros((0, self.n_envs))
            )
            if eval_mode:
                # episode accounting over however many steps eval ran
                ft = np.zeros((reward_trajs.shape[0] + 1, self.n_envs))
                ft[0] = 1
                stats = self._episode_stats_from(ft, reward_trajs)
            else:
                stats = self._episode_stats(
                    firsts_trajs, reward_trajs[: self.n_steps]
                )

            diag = {}
            if not eval_mode and self._should_update():
                diag = self._do_updates()
            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self.state.params)
            if self.itr > self.n_explore_steps:
                self._log_iteration(
                    eval_mode, stats, diag, cnt_train_step, timer
                )
            self.itr += 1

    def _episode_stats_from(self, firsts, rewards):
        """Eval-mode accounting where done flags weren't tracked per step:
        fall back to summing whole-env returns."""
        if rewards.shape[0] == 0:
            return {
                "num_episode_finished": 0,
                "avg_episode_reward": 0.0,
                "avg_best_reward": 0.0,
                "success_rate": 0.0,
            }
        episode_reward = rewards.sum(axis=0)
        episode_best_reward = rewards.max(axis=0) / self.act_steps
        return {
            "num_episode_finished": int(rewards.shape[1]),
            "avg_episode_reward": float(np.mean(episode_reward)),
            "avg_best_reward": float(np.mean(episode_best_reward)),
            "success_rate": float(
                np.mean(
                    episode_best_reward >= self.best_reward_threshold_for_success
                )
            ),
        }
