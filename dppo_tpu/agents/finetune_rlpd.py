"""RLPD fine-tuning (parity: `agent/finetune/train_rlpd_agent.py`, 404 LoC):
SAC with a critic ensemble and an offline demonstration dataset mixed 50/50
into every update batch (`:98-112`, `:249-327`); `critic_num_update` critic
updates per update iteration, one actor + temperature update with the final
merged batch."""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_sac import SACTrainState, TrainSACAgent
from dppo_tpu.config import instantiate
from dppo_tpu.utils.replay import ReplayState, replay_sample_indices

log = logging.getLogger(__name__)


class TrainRLPDAgent(TrainSACAgent):
    def __init__(self, cfg):
        self.critic_num_update = int(cfg.train.critic_num_update)
        self._offline_cfg = cfg.offline_dataset
        super().__init__(cfg)
        ds = instantiate(self._offline_cfg)
        batch = ds.get_batch(jnp.arange(len(ds), dtype=jnp.int32))
        self.offline = {
            "obs": batch.conditions["state"],
            "next_obs": batch.conditions["next_state"],
            "actions": batch.actions[:, : self.act_steps],
            "rewards": batch.rewards.reshape(-1),
            "terminated": batch.dones.reshape(-1),
        }
        self.n_offline = int(self.offline["rewards"].shape[0])
        self._jit_update = jax.jit(self._rlpd_update)

    def _init_model_params(self, cond, example_action, init_temperature):
        return self.model.init_rlpd_params(
            self.next_rng(), cond, example_action, init_temperature
        )

    def _critic_leaf(self, params):
        return params.critic_ensemble

    def _set_critic_leaf(self, params, new_critic):
        return params._replace(critic_ensemble=new_critic)

    def _mixed_batch(self, rng, replay: ReplayState):
        r_off, r_on = jax.random.split(rng)
        half = self.batch_size // 2
        inds_off = jax.random.randint(r_off, (half,), 0, self.n_offline)
        inds_on = replay_sample_indices(r_on, replay, half)
        batch = {}
        for k in self.offline:
            batch[k] = jnp.concatenate(
                [self.offline[k][inds_off], replay.data[k][inds_on]], axis=0
            )
        return batch

    def _rlpd_update(self, state: SACTrainState, replay: ReplayState, rng):
        model = self.model

        def critic_step(carry, sub):
            state = carry
            r_batch, r_loss = jax.random.split(sub)
            batch = self._mixed_batch(r_batch, replay)
            obs_b = {"state": batch["obs"]}
            next_obs_b = {"state": batch["next_obs"]}
            alpha = jnp.exp(state.params.log_alpha)
            loss_critic, grads = jax.value_and_grad(model.loss_critic)(
                state.params.critic_ensemble, state.params, obs_b, next_obs_b,
                batch["actions"], batch["rewards"], batch["terminated"],
                self.gamma, alpha, r_loss,
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
                batch,
            )

        rngs = jax.random.split(rng, self.critic_num_update + 2)
        state, (losses, batches) = jax.lax.scan(
            critic_step, state, rngs[: self.critic_num_update]
        )
        final_batch = jax.tree_util.tree_map(lambda x: x[-1], batches)
        obs_b = {"state": final_batch["obs"]}
        alpha = jnp.exp(state.params.log_alpha)
        loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
            state.params.actor, state.params, obs_b, alpha,
            rngs[self.critic_num_update],
        )
        a_updates, actor_opt = self.actor_optimizer.update(
            a_grads, state.actor_opt, state.params.actor
        )
        params = state.params._replace(
            actor=optax.apply_updates(state.params.actor, a_updates)
        )
        loss_alpha, al_grads = jax.value_and_grad(model.loss_temperature)(
            params.log_alpha, params, obs_b, self.target_entropy,
            rngs[self.critic_num_update + 1],
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
            losses.mean(),
            loss_actor,
        )

    def _should_update(self):
        return self.itr > self.n_explore_steps

    def _do_updates(self) -> dict:
        self.state, loss_critic, loss_actor = self._jit_update(
            self.state, self.replay, self.next_rng()
        )
        return {
            "loss_critic": float(loss_critic),
            "loss_actor": float(loss_actor),
            "alpha": float(jnp.exp(self.state.params.log_alpha)),
        }
