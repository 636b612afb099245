"""QSM fine-tuning (parity: `agent/finetune/train_qsm_diffusion_agent.py`,
332 LoC): per-batch critic TD update with noisy next actions, Q-score-
matching actor update aligning predicted noise with ∂Q/∂a, Polyak target."""

from __future__ import annotations

import logging
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import set_lr
from dppo_tpu.agents.offpolicy_base import TrainOffPolicyDiffusionAgent
from dppo_tpu.utils.replay import ReplayState, replay_sample_indices

log = logging.getLogger(__name__)


class QSMState(NamedTuple):
    params: Any  # QSMParams
    actor_opt: Any
    critic_opt: Any


class TrainQSMDiffusionAgent(TrainOffPolicyDiffusionAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.q_grad_coeff = float(cfg.train.q_grad_coeff)
        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        example_action = jnp.zeros(
            (self.n_envs, self.act_steps, self.action_dim)
        )
        params = self.model.init_qsm_params(
            self.next_rng(), cond, example_action
        )
        self.state = QSMState(
            params,
            self.actor_optimizer.init(params.actor),
            self.critic_optimizer.init(params.critic_q),
        )
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_update = jax.jit(self._update)

    def _sample_action(self, cond, eval_mode):
        return np.asarray(
            self._jit_sample(self.state.params, cond, self.next_rng(), eval_mode)
        )

    def _update(self, state: QSMState, replay: ReplayState, rng, itr):
        model = self.model
        actor_opt = set_lr(
            state.actor_opt,
            self.actor_lr(jnp.maximum(itr - self.n_critic_warmup_itr, 0)),
        )
        critic_opt = set_lr(state.critic_opt, self.critic_lr(itr))

        def batch_step(carry, sub):
            params, a_opt, c_opt = carry
            r_idx, r_critic, r_actor = jax.random.split(sub, 3)
            inds = replay_sample_indices(r_idx, replay, self.batch_size)
            obs_b = {"state": replay.data["obs"][inds]}
            next_obs_b = {"state": replay.data["next_obs"][inds]}
            actions_b = replay.data["actions"][inds]
            rewards_b = replay.data["rewards"][inds]
            term_b = replay.data["terminated"][inds]

            loss_critic, c_grads = jax.value_and_grad(model.loss_critic)(
                params.critic_q, params, obs_b, next_obs_b, actions_b,
                rewards_b, term_b, self.gamma, r_critic,
            )
            c_updates, c_opt = self.critic_optimizer.update(
                c_grads, c_opt, params.critic_q
            )
            params = params._replace(
                critic_q=optax.apply_updates(params.critic_q, c_updates)
            )

            loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
                params.actor, params, obs_b, actions_b, self.q_grad_coeff,
                r_actor,
            )
            a_updates, a_opt_new = self.actor_optimizer.update(
                a_grads, a_opt, params.actor
            )
            do_actor = itr >= self.n_critic_warmup_itr
            new_actor = jax.tree_util.tree_map(
                lambda p, u: jnp.where(do_actor, p + u, p),
                params.actor,
                a_updates,
            )
            a_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_actor, new, old), a_opt_new, a_opt
            )
            params = params._replace(actor=new_actor)
            params = model.update_target_critic(params, self.target_ema_rate)
            return (params, a_opt, c_opt), jnp.stack([loss_actor, loss_critic])

        rngs = jax.random.split(rng, self.num_batch)
        (params, actor_opt, critic_opt), losses = jax.lax.scan(
            batch_step, (state.params, actor_opt, critic_opt), rngs
        )
        return QSMState(params, actor_opt, critic_opt), losses.mean(0)

    def _do_update(self):
        self.state, losses = self._jit_update(
            self.state, self.replay, self.next_rng(),
            jnp.asarray(self.itr, jnp.int32),
        )
        return {
            "loss_actor": float(losses[0]),
            "loss_critic": float(losses[1]),
        }
