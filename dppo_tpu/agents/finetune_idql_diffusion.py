"""IDQL fine-tuning (parity: `agent/finetune/train_idql_diffusion_agent.py`,
367 LoC): per-batch expectile-V update, Q TD update toward r + γV(s'),
Polyak target-Q, unweighted BC actor update; sampling draws
`eval_sample_num` candidate chains re-weighted by Q."""

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


class IDQLState(NamedTuple):
    params: Any  # IDQLParams
    actor_opt: Any
    critic_q_opt: Any
    critic_v_opt: Any


class TrainIDQLDiffusionAgent(TrainOffPolicyDiffusionAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.critic_tau = float(cfg.train.critic_tau)
        self.use_expectile_exploration = bool(
            cfg.train.use_expectile_exploration
        )
        self.eval_deterministic = bool(cfg.train.get("eval_deterministic", False))
        self.num_sample = int(cfg.train.eval_sample_num)
        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        example_action = jnp.zeros(
            (self.n_envs, self.act_steps, self.action_dim)
        )
        params = self.model.init_idql_params(
            self.next_rng(), cond, example_action
        )
        self.state = IDQLState(
            params,
            self.actor_optimizer.init(params.actor),
            self.critic_optimizer.init(params.critic_q),
            self.critic_optimizer.init(params.critic_v),
        )
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(
                p, c, r,
                deterministic=det,
                num_sample=self.num_sample,
                use_expectile_exploration=self.use_expectile_exploration,
            ),
            static_argnames=("det",),
        )
        self._jit_update = jax.jit(self._update)

    def _sample_action(self, cond, eval_mode):
        det = eval_mode and self.eval_deterministic
        return np.asarray(
            self._jit_sample(self.state.params, cond, self.next_rng(), det)
        )

    def _update(self, state: IDQLState, replay: ReplayState, rng, itr):
        model = self.model
        actor_opt = set_lr(
            state.actor_opt,
            self.actor_lr(jnp.maximum(itr - self.n_critic_warmup_itr, 0)),
        )
        q_opt = set_lr(state.critic_q_opt, self.critic_lr(itr))
        v_opt = set_lr(state.critic_v_opt, self.critic_lr(itr))

        def batch_step(carry, sub):
            params, a_opt, q_opt, v_opt = carry
            r_idx, r_bc = jax.random.split(sub)
            inds = replay_sample_indices(r_idx, replay, self.batch_size)
            obs_b = {"state": replay.data["obs"][inds]}
            next_obs_b = {"state": replay.data["next_obs"][inds]}
            actions_b = replay.data["actions"][inds]
            rewards_b = replay.data["rewards"][inds]
            term_b = replay.data["terminated"][inds]

            loss_v, v_grads = jax.value_and_grad(model.loss_critic_v)(
                params.critic_v, params, obs_b, actions_b
            )
            v_updates, v_opt = self.critic_optimizer.update(
                v_grads, v_opt, params.critic_v
            )
            params = params._replace(
                critic_v=optax.apply_updates(params.critic_v, v_updates)
            )

            loss_q, q_grads = jax.value_and_grad(model.loss_critic_q)(
                params.critic_q, params, obs_b, next_obs_b, actions_b,
                rewards_b, term_b, self.gamma,
            )
            q_updates, q_opt = self.critic_optimizer.update(
                q_grads, q_opt, params.critic_q
            )
            params = params._replace(
                critic_q=optax.apply_updates(params.critic_q, q_updates)
            )
            params = model.update_target_critic(params, self.critic_tau)

            loss_actor, a_grads = jax.value_and_grad(model.loss)(
                params.actor, r_bc, actions_b, obs_b
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
            return (params, a_opt, q_opt, v_opt), jnp.stack(
                [loss_actor, loss_q + loss_v]
            )

        rngs = jax.random.split(rng, self.num_batch)
        (params, actor_opt, q_opt, v_opt), losses = jax.lax.scan(
            batch_step, (state.params, actor_opt, q_opt, v_opt), rngs
        )
        return IDQLState(params, actor_opt, q_opt, v_opt), losses.mean(0)

    def _do_update(self):
        self.state, losses = self._jit_update(
            self.state, self.replay, self.next_rng(),
            jnp.asarray(self.itr, jnp.int32),
        )
        return {
            "loss_actor": float(losses[0]),
            "loss_critic": float(losses[1]),
        }
