"""Shared base for off-policy diffusion fine-tuners (DQL/DIPO/IDQL/QSM).

Captures the common structure of `train_{dql,dipo,idql,qsm}_diffusion_agent.py`:
iteration = rollout of `n_steps` macro-steps appended to a FIFO transition
replay (with truncation-aware `final_obs` bootstrapping), then
`num_batch = n_steps * n_envs / batch_size * replay_ratio` sampled updates,
with actor/critic optimizers on cosine-warmup-restart schedules and Polyak
target updates per batch.

TPU structure: the replay lives on device (`utils/replay.py`); the whole
update phase (all `num_batch` sampled minibatch updates + target EMAs) is
one jitted `lax.scan`.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.finetune_base import TrainAgent, make_optimizer
from dppo_tpu.utils.replay import ReplayState, replay_init, replay_insert
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class TrainOffPolicyDiffusionAgent(TrainAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gamma = float(cfg.train.gamma)
        self.n_critic_warmup_itr = int(cfg.train.get("n_critic_warmup_itr", 0))
        self.buffer_size = int(cfg.train.buffer_size)
        self.scale_reward_factor = float(cfg.train.get("scale_reward_factor", 1))
        self.replay_ratio = int(cfg.train.replay_ratio)
        self.target_ema_rate = float(cfg.train.get("target_ema_rate", 0.005))

        a = cfg.train.actor_lr_scheduler
        self.actor_lr = cosine_warmup_restarts(
            float(cfg.train.actor_lr), float(a.min_lr),
            int(a.first_cycle_steps), int(a.warmup_steps),
        )
        c = cfg.train.critic_lr_scheduler
        self.critic_lr = cosine_warmup_restarts(
            float(cfg.train.critic_lr), float(c.min_lr),
            int(c.first_cycle_steps), int(c.warmup_steps),
        )
        self.actor_optimizer = make_optimizer(
            float(cfg.train.actor_lr), float(cfg.train.actor_weight_decay),
            self.max_grad_norm,
        )
        self.critic_optimizer = make_optimizer(
            float(cfg.train.critic_lr), float(cfg.train.critic_weight_decay)
        )
        self.num_batch = max(
            1,
            int(self.n_steps * self.n_envs / self.batch_size * self.replay_ratio),
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

    # subclasses: build self.state (params + opt states), self._jit_update,
    # self._jit_sample

    def _sample_action(self, cond, eval_mode):
        raise NotImplementedError

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        last_itr_eval = False
        done_venv = np.zeros(self.n_envs, dtype=bool)
        prev_obs_venv = None
        while self.itr < self.n_train_itr:
            options_venv = [{} for _ in range(self.n_envs)]
            eval_mode = self.itr % self.val_freq == 0 and not self.force_train
            firsts_trajs = np.zeros((self.n_steps + 1, self.n_envs))
            if (
                self.reset_at_iteration
                or eval_mode
                or last_itr_eval
                or prev_obs_venv is None
            ):
                prev_obs_venv = self.reset_env_all(options_venv=options_venv)
                firsts_trajs[0] = 1
            else:
                firsts_trajs[0] = done_venv
            last_itr_eval = eval_mode

            reward_trajs = np.zeros((self.n_steps, self.n_envs), dtype=np.float32)
            for step in range(self.n_steps):
                cond = {
                    "state": jnp.asarray(prev_obs_venv["state"], jnp.float32)
                }
                samples = self._sample_action(cond, eval_mode)
                action_venv = samples[:, : self.act_steps]
                obs_venv, reward_venv, terminated_venv, truncated_venv, info_venv = (
                    self.venv.step(action_venv)
                )
                done_venv = terminated_venv | truncated_venv
                if not eval_mode:
                    next_state = obs_venv["state"].copy()
                    for i in range(self.n_envs):
                        if truncated_venv[i] and "final_obs" in info_venv[i]:
                            next_state[i] = info_venv[i]["final_obs"]["state"]
                    self.replay = self._jit_insert(
                        self.replay,
                        {
                            "obs": jnp.asarray(
                                prev_obs_venv["state"], jnp.float32
                            ),
                            "next_obs": jnp.asarray(next_state, jnp.float32),
                            "actions": jnp.asarray(action_venv, jnp.float32),
                            "rewards": jnp.asarray(
                                reward_venv * self.scale_reward_factor,
                                jnp.float32,
                            ),
                            "terminated": jnp.asarray(
                                terminated_venv.astype(np.float32)
                            ),
                        },
                    )
                reward_trajs[step] = reward_venv
                firsts_trajs[step + 1] = done_venv
                prev_obs_venv = obs_venv
                cnt_train_step += (
                    self.n_envs * self.act_steps if not eval_mode else 0
                )

            stats = self._episode_stats(firsts_trajs, reward_trajs)
            diag = {}
            if not eval_mode and int(self.replay.size) > 0:
                diag = self._do_update()
            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self._params_to_save())
            self._log_iteration(eval_mode, stats, diag, cnt_train_step, timer)
            self.itr += 1

    def _do_update(self) -> dict:
        raise NotImplementedError

    def _params_to_save(self):
        return self.state.params
