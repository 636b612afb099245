"""RWR fine-tuning of diffusion policies.

Parity with `agent/finetune/train_rwr_diffusion_agent.py:20` (318 LoC):
on-policy rollouts, per-episode Monte-Carlo returns (only for episodes that
complete within the iteration), return normalization across the collected
set, exponential reward weights clipped at `max_reward_weight`, minibatch
epochs of reward-weighted regression.

TPU structure: episode splitting stays host-side (ragged), but the
concatenated transition set is padded to the static capacity S*E with a
zero-weight mask so the whole multi-epoch update is one jitted program
regardless of how many episodes finished.
"""

from __future__ import annotations

import logging
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import TrainAgent, make_optimizer, set_lr
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class RWRState(NamedTuple):
    params: Any
    opt_state: Any


class TrainRWRDiffusionAgent(TrainAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gamma = float(cfg.train.gamma)
        self.beta = float(cfg.train.beta)
        self.max_reward_weight = float(cfg.train.max_reward_weight)
        self.update_epochs = int(cfg.train.update_epochs)
        lr_cfg = cfg.train.lr_scheduler
        self.lr_schedule = cosine_warmup_restarts(
            float(cfg.train.lr),
            float(lr_cfg.min_lr),
            int(lr_cfg.first_cycle_steps),
            int(lr_cfg.warmup_steps),
        )
        self.optimizer = make_optimizer(
            float(cfg.train.lr),
            float(cfg.train.weight_decay),
            self.max_grad_norm,
        )
        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        params = self.model.load_params(self.next_rng(), cond=cond)
        self.state = RWRState(params, self.optimizer.init(params))
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.forward(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_update = jax.jit(self._update)

    def _update(self, state: RWRState, obs, actions, returns, valid, rng, itr):
        """obs: (N, To, Do); actions: (N, Ta, Da); returns/valid: (N,)."""
        n_valid = jnp.maximum(valid.sum(), 1.0)
        mean = (returns * valid).sum() / n_valid
        var = ((returns - mean) ** 2 * valid).sum() / n_valid
        returns = (returns - mean) / (jnp.sqrt(var) + 1e-3)
        weights = jnp.minimum(
            jnp.exp(self.beta * returns), self.max_reward_weight
        )
        weights = weights * valid

        N = returns.shape[0]
        num_batch = max(1, N // self.batch_size)
        bs = min(self.batch_size, N)
        opt_state = set_lr(state.opt_state, self.lr_schedule(itr))
        perm_rngs = jax.random.split(rng, self.update_epochs + 1)
        perms = jax.vmap(lambda r: jax.random.permutation(r, N))(perm_rngs[1:])
        mb_inds = perms[:, : num_batch * bs].reshape(
            self.update_epochs * num_batch, bs
        )
        loss_rngs = jax.random.split(
            perm_rngs[0], self.update_epochs * num_batch
        )

        def minibatch_step(carry, xs):
            params, opt_state = carry
            inds, sub = xs
            loss, grads = jax.value_and_grad(self.model.loss)(
                params,
                sub,
                actions[inds],
                {"state": obs[inds]},
                weights[inds],
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch_step, (state.params, opt_state), (mb_inds, loss_rngs)
        )
        return RWRState(params, opt_state), jnp.mean(losses)

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        last_itr_eval = False
        done_venv = np.zeros(self.n_envs, dtype=bool)
        prev_obs_venv = None
        while self.itr < self.n_train_itr:
            options_venv = [{} for _ in range(self.n_envs)]
            if (
                self.itr % self.render_freq == 0
                and self.render_video
                and self.n_render > 0
            ):
                for i in range(self.n_render):
                    options_venv[i]["video_path"] = os.path.join(
                        self.render_dir, f"itr-{self.itr}_trial-{i}.mp4"
                    )
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

            obs_trajs = np.zeros(
                (self.n_steps, self.n_envs, self.n_cond_step, self.obs_dim),
                dtype=np.float32,
            )
            samples_trajs = np.zeros(
                (self.n_steps, self.n_envs, self.horizon_steps, self.action_dim),
                dtype=np.float32,
            )
            reward_trajs = np.zeros((self.n_steps, self.n_envs), dtype=np.float32)

            for step in range(self.n_steps):
                cond = {
                    "state": jnp.asarray(prev_obs_venv["state"], jnp.float32)
                }
                samples = np.asarray(
                    self._jit_sample(
                        self.state.params, cond, self.next_rng(), eval_mode
                    )
                )
                action_venv = samples[:, : self.act_steps]
                obs_venv, reward_venv, terminated_venv, truncated_venv, _ = (
                    self.venv.step(action_venv)
                )
                done_venv = terminated_venv | truncated_venv
                obs_trajs[step] = prev_obs_venv["state"]
                samples_trajs[step] = samples
                reward_trajs[step] = reward_venv
                firsts_trajs[step + 1] = done_venv
                prev_obs_venv = obs_venv
                cnt_train_step += (
                    self.n_envs * self.act_steps if not eval_mode else 0
                )

            stats = self._episode_stats(firsts_trajs, reward_trajs)
            loss = float("nan")
            if not eval_mode:
                # completed-episode MC returns, host-side ragged split
                N = self.n_steps * self.n_envs
                obs_flat = np.zeros(
                    (N, self.n_cond_step, self.obs_dim), dtype=np.float32
                )
                act_flat = np.zeros(
                    (N, self.horizon_steps, self.action_dim), dtype=np.float32
                )
                ret_flat = np.zeros((N,), dtype=np.float32)
                valid = np.zeros((N,), dtype=np.float32)
                fill = 0
                for env_ind in range(self.n_envs):
                    env_steps = np.where(firsts_trajs[:, env_ind] == 1)[0]
                    for i in range(len(env_steps) - 1):
                        start, end = env_steps[i], env_steps[i + 1]
                        if end - start <= 1:
                            continue
                        rewards = reward_trajs[start:end, env_ind]
                        returns = np.zeros_like(rewards)
                        prev = 0.0
                        for t in range(len(rewards) - 1, -1, -1):
                            prev = rewards[t] + self.gamma * prev
                            returns[t] = prev
                        n = len(rewards)
                        obs_flat[fill : fill + n] = obs_trajs[
                            start:end, env_ind
                        ]
                        act_flat[fill : fill + n] = samples_trajs[
                            start:end, env_ind
                        ]
                        ret_flat[fill : fill + n] = returns
                        valid[fill : fill + n] = 1.0
                        fill += n
                if fill > 0:
                    self.state, loss = self._jit_update(
                        self.state,
                        jnp.asarray(obs_flat),
                        jnp.asarray(act_flat),
                        jnp.asarray(ret_flat),
                        jnp.asarray(valid),
                        self.next_rng(),
                        jnp.asarray(self.itr, dtype=jnp.int32),
                    )
                    loss = float(loss)

            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self.state.params)
            diag = {"loss": loss}
            self._log_iteration(eval_mode, stats, diag, cnt_train_step, timer)
            self.itr += 1
