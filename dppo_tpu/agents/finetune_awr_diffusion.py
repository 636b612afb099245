"""AWR fine-tuning of diffusion policies.

Parity with `agent/finetune/train_awr_diffusion_agent.py` (394 LoC): a FIFO
replay of the most recent `buffer_size` macro-steps across iterations, TD(λ)
value targets (`td_values:27-63`), critic MSE updates at
`num_batch // critic_update_ratio`, and exp(β·Â)-weighted regression actor
updates with per-minibatch advantage normalization.

Deviation from the reference (intentional): the reference's critic-update
index draw samples only the first `n_buffer_steps` rows of the flattened
(step × env) array (`train_awr_diffusion_agent.py:264-266` uses
`len(obs_trajs)` before the rearrange); we sample uniformly from all rows —
the evident intent.
"""

from __future__ import annotations

import logging
import os
from collections import deque
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import TrainAgent, make_optimizer, set_lr
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class AWRState(NamedTuple):
    params: Any  # AWRParams(actor, critic)
    actor_opt: Any
    critic_opt: Any


class TrainAWRDiffusionAgent(TrainAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gamma = float(cfg.train.gamma)
        self.n_critic_warmup_itr = int(cfg.train.n_critic_warmup_itr)
        self.beta = float(cfg.train.beta)
        self.max_adv_weight = float(cfg.train.max_adv_weight)
        self.scale_reward_factor = float(cfg.train.scale_reward_factor)
        self.buffer_size = int(cfg.train.buffer_size)
        self.replay_ratio = int(cfg.train.replay_ratio)
        self.critic_update_ratio = int(cfg.train.critic_update_ratio)

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
        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        params = self.model.init_awr_params(self.next_rng(), cond)
        self.state = AWRState(
            params,
            self.actor_optimizer.init(params.actor),
            self.critic_optimizer.init(params.critic),
        )
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.forward(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_update = jax.jit(self._update)

    def _update(
        self,
        state: AWRState,
        obs,
        actions,
        rewards,
        terminateds,
        rng,
        itr,
        n_valid_steps=None,
    ):
        """Buffered arrays, time-ordered: obs (Sb, E, To, Do); actions
        (Sb, E, Ta, Da); rewards/terminateds (Sb, E).

        `n_valid_steps` (traced int32, optional) marks the newest
        `n_valid_steps` rows as the sample population — used by the fused
        device agent whose fixed-capacity window fills front-padded with
        zeros (the host deque path always passes full arrays). TD(λ)
        targets for valid rows only ever read values at or after their own
        row, so the front padding never leaks into sampled targets."""
        model = self.model
        Sb, E = rewards.shape
        N = Sb * E
        if n_valid_steps is None:
            n_valid_steps = jnp.asarray(Sb, jnp.int32)
        valid_base = (Sb - n_valid_steps) * E
        n_valid = n_valid_steps * E
        obs_flat = obs.reshape(N, *obs.shape[2:])

        values = model.critic_value(state.params, {"state": obs_flat}).reshape(
            Sb, E
        )

        # TD(λ) targets (parity: td_values, alpha=0.95, lam=0.95):
        # next_value[i] = values[i+1] (values[Sb-1] at the boundary), masked
        # by terminateds[i]
        alpha, lam = 0.95, 0.95
        next_values = jnp.concatenate([values[1:], values[-1:]], axis=0)
        masked_next = next_values * (1.0 - terminateds)

        def td_step(val, xs):
            reward_t, value_t, next_t, term_t = xs
            error = reward_t + self.gamma * next_t - value_t
            val = alpha * error + self.gamma * lam * (1.0 - term_t) * val
            return val, val + value_t

        _, tds_rev = jax.lax.scan(
            td_step,
            jnp.zeros((E,)),
            (
                rewards[::-1],
                values[::-1],
                masked_next[::-1],
                terminateds[::-1],
            ),
        )
        td_flat = tds_rev[::-1].reshape(N)
        advantages = td_flat - values.reshape(N)

        num_batch = max(
            1, int(self.n_steps * self.n_envs / self.batch_size * self.replay_ratio)
        )
        n_critic = max(1, num_batch // self.critic_update_ratio)
        bs = min(self.batch_size, N)
        actor_opt = set_lr(
            state.actor_opt,
            self.actor_lr(jnp.maximum(itr - self.n_critic_warmup_itr, 0)),
        )
        critic_opt = set_lr(state.critic_opt, self.critic_lr(itr))

        # critic updates
        rngs = jax.random.split(rng, n_critic + num_batch + 1)

        def critic_step(carry, sub):
            critic_params, c_opt = carry
            inds = valid_base + jax.random.randint(sub, (bs,), 0, n_valid)
            loss, grads = jax.value_and_grad(model.loss_critic)(
                critic_params, {"state": obs_flat[inds]}, td_flat[inds]
            )
            updates, c_opt = self.critic_optimizer.update(
                grads, c_opt, critic_params
            )
            return (optax.apply_updates(critic_params, updates), c_opt), loss

        (critic_params, critic_opt), critic_losses = jax.lax.scan(
            critic_step,
            (state.params.critic, critic_opt),
            rngs[1 : n_critic + 1],
        )

        # actor updates
        actions_flat = actions.reshape(N, *actions.shape[2:])

        def actor_step(carry, sub):
            actor_params, a_opt = carry
            sub_i, sub_l = jax.random.split(sub)
            inds = valid_base + jax.random.randint(sub_i, (bs,), 0, n_valid)
            adv_b = advantages[inds]
            adv_b = (adv_b - adv_b.mean()) / (adv_b.std(ddof=1) + 1e-6)
            weights = jnp.minimum(
                jnp.exp(self.beta * adv_b), self.max_adv_weight
            )
            loss, grads = jax.value_and_grad(model.loss)(
                actor_params,
                sub_l,
                actions_flat[inds],
                {"state": obs_flat[inds]},
                weights,
            )
            updates, a_opt = self.actor_optimizer.update(
                grads, a_opt, actor_params
            )
            do_actor = itr >= self.n_critic_warmup_itr
            new_params = jax.tree_util.tree_map(
                lambda p, u: jnp.where(do_actor, p + u, p),
                actor_params,
                updates,
            )
            return (new_params, a_opt), loss

        (actor_params, actor_opt), actor_losses = jax.lax.scan(
            actor_step,
            (state.params.actor, actor_opt),
            rngs[n_critic + 1 :],
        )
        new_state = AWRState(
            state.params._replace(actor=actor_params, critic=critic_params),
            actor_opt,
            critic_opt,
        )
        return new_state, jnp.mean(actor_losses), jnp.mean(critic_losses)

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        last_itr_eval = False
        done_venv = np.zeros(self.n_envs, dtype=bool)
        prev_obs_venv = None
        max_buffer_steps = self.buffer_size // self.n_envs
        obs_buffer = deque(maxlen=max_buffer_steps)
        action_buffer = deque(maxlen=max_buffer_steps)
        reward_buffer = deque(maxlen=max_buffer_steps)
        terminated_buffer = deque(maxlen=max_buffer_steps)
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
                samples = np.asarray(
                    self._jit_sample(
                        self.state.params.actor, cond, self.next_rng(), eval_mode
                    )
                )
                action_venv = samples[:, : self.act_steps]
                obs_venv, reward_venv, terminated_venv, truncated_venv, _ = (
                    self.venv.step(action_venv)
                )
                done_venv = terminated_venv | truncated_venv
                if not eval_mode:
                    obs_buffer.append(prev_obs_venv["state"].copy())
                    action_buffer.append(samples)
                    reward_buffer.append(
                        reward_venv * self.scale_reward_factor
                    )
                    terminated_buffer.append(
                        terminated_venv.astype(np.float32)
                    )
                reward_trajs[step] = reward_venv
                firsts_trajs[step + 1] = done_venv
                prev_obs_venv = obs_venv
                cnt_train_step += (
                    self.n_envs * self.act_steps if not eval_mode else 0
                )

            stats = self._episode_stats(firsts_trajs, reward_trajs)
            diag = {}
            if not eval_mode and len(obs_buffer) > 0:
                self.state, loss_actor, loss_critic = self._jit_update(
                    self.state,
                    jnp.asarray(np.stack(obs_buffer)),
                    jnp.asarray(np.stack(action_buffer)),
                    jnp.asarray(np.stack(reward_buffer)),
                    jnp.asarray(np.stack(terminated_buffer)),
                    self.next_rng(),
                    jnp.asarray(self.itr, dtype=jnp.int32),
                )
                diag = {
                    "loss_actor": float(loss_actor),
                    "loss_critic": float(loss_critic),
                }
            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self.state.params)
            self._log_iteration(eval_mode, stats, diag, cnt_train_step, timer)
            self.itr += 1
