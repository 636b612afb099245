"""IBRL fine-tuning (parity: `agent/finetune/train_ibrl_agent.py`, 354 LoC):
SAC-style single-step loop with a frozen IL policy + online RL actor;
`critic_num_update` critic updates then one actor update per `update_freq`
iterations; Polyak updates for target critic ensemble and target actor."""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_sac import SACTrainState, TrainSACAgent
from dppo_tpu.utils.replay import ReplayState, replay_sample_indices

log = logging.getLogger(__name__)


class TrainIBRLAgent(TrainSACAgent):
    def __init__(self, cfg):
        self.critic_num_update = int(cfg.train.critic_num_update)
        self.update_freq = int(cfg.train.update_freq)
        # SAC base expects these; IBRL has no temperature
        cfg.train.setdefault("critic_replay_ratio", 1)
        cfg.train.setdefault("actor_replay_ratio", 1)
        cfg.train.setdefault("init_temperature", 1.0)
        cfg.train.setdefault("target_entropy", 0.0)
        super().__init__(cfg)
        self._jit_update = jax.jit(self._ibrl_update)

    def _init_model_params(self, cond, example_action, init_temperature):
        return self.model.init_ibrl_params(
            self.next_rng(), cond, example_action
        )

    def _critic_leaf(self, params):
        return params.critic_ensemble

    def _ibrl_update(self, state: SACTrainState, replay: ReplayState, rng):
        model = self.model

        def critic_step(carry, sub):
            state = carry
            r_idx, r_loss = jax.random.split(sub)
            inds = replay_sample_indices(r_idx, replay, self.batch_size)
            obs_b = {"state": replay.data["obs"][inds]}
            next_obs_b = {"state": replay.data["next_obs"][inds]}
            loss_critic, grads = jax.value_and_grad(model.loss_critic)(
                state.params.critic_ensemble, state.params, obs_b, next_obs_b,
                replay.data["actions"][inds], replay.data["rewards"][inds],
                replay.data["terminated"][inds], self.gamma, r_loss,
            )
            updates, critic_opt = self.critic_optimizer.update(
                grads, state.critic_opt, state.params.critic_ensemble
            )
            params = state.params._replace(
                critic_ensemble=optax.apply_updates(
                    state.params.critic_ensemble, updates
                )
            )
            params = model.update_target_critic(params, self.target_ema_rate)
            return state._replace(params=params, critic_opt=critic_opt), (
                loss_critic,
                inds,
            )

        rngs = jax.random.split(rng, self.critic_num_update + 1)
        state, (losses, all_inds) = jax.lax.scan(
            critic_step, state, rngs[: self.critic_num_update]
        )
        final_inds = all_inds[-1]
        obs_b = {"state": replay.data["obs"][final_inds]}
        loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
            state.params.actor, state.params, obs_b,
            rngs[self.critic_num_update],
        )
        a_updates, actor_opt = self.actor_optimizer.update(
            a_grads, state.actor_opt, state.params.actor
        )
        params = state.params._replace(
            actor=optax.apply_updates(state.params.actor, a_updates)
        )
        params = model.update_target_actor(params, self.target_ema_rate)
        return (
            state._replace(params=params, actor_opt=actor_opt),
            losses.mean(),
            loss_actor,
        )

    def _should_update(self):
        return (
            self.itr > self.n_explore_steps
            and self.itr % self.update_freq == 0
        )

    def _do_updates(self) -> dict:
        self.state, loss_critic, loss_actor = self._jit_update(
            self.state, self.replay, self.next_rng()
        )
        return {
            "loss_critic": float(loss_critic),
            "loss_actor": float(loss_actor),
        }
