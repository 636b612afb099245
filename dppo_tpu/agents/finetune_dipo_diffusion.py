"""DIPO fine-tuning (parity: `agent/finetune/train_dipo_diffusion_agent.py`,
375 LoC): per-batch critic TD update; actions re-optimized by
`action_gradient_steps` of Adam ascent on min-Q (`:270-296`) and written back
into the replay (the action-gradient buffer); actor BC toward the improved
actions; Polyak updates of both target critic and target actor."""

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


class DIPOState(NamedTuple):
    params: Any  # DIPOParams
    actor_opt: Any
    critic_opt: Any


class TrainDIPODiffusionAgent(TrainOffPolicyDiffusionAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.action_lr = float(cfg.train.action_lr)
        self.action_gradient_steps = int(cfg.train.action_gradient_steps)
        example_obs = self.venv.reset_arg()
        cond = {"state": jnp.asarray(example_obs["state"], jnp.float32)}
        example_action = jnp.zeros(
            (self.n_envs, self.act_steps, self.action_dim)
        )
        params = self.model.init_dipo_params(
            self.next_rng(), cond, example_action
        )
        self.state = DIPOState(
            params,
            self.actor_optimizer.init(params.actor),
            self.critic_optimizer.init(params.critic),
        )
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.forward(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_update = jax.jit(self._update)

    def _sample_action(self, cond, eval_mode):
        return np.asarray(
            self._jit_sample(self.state.params, cond, self.next_rng(), eval_mode)
        )

    def _improve_actions(self, params, obs_b, actions_b):
        """Adam ascent on min-Q over the action tensor (parity :270-296)."""
        action_optim = optax.adam(self.action_lr, eps=1e-5)

        def neg_q(a):
            q1, q2 = self.model.critic.apply(params.critic, obs_b, a)
            return -jnp.minimum(q1, q2).sum()

        def ascent_step(carry, _):
            a, opt_state = carry
            grads = jax.grad(neg_q)(a)
            updates, opt_state = action_optim.update(grads, opt_state)
            a = jnp.clip(optax.apply_updates(a, updates), -1.0, 1.0)
            return (a, opt_state), None

        (improved, _), _ = jax.lax.scan(
            ascent_step,
            (actions_b, action_optim.init(actions_b)),
            None,
            length=self.action_gradient_steps,
        )
        return jax.lax.stop_gradient(improved)

    def _update(self, state: DIPOState, replay: ReplayState, rng, itr):
        model = self.model
        actor_opt = set_lr(
            state.actor_opt,
            self.actor_lr(jnp.maximum(itr - self.n_critic_warmup_itr, 0)),
        )
        critic_opt = set_lr(state.critic_opt, self.critic_lr(itr))
        action_data = replay.data["actions"]

        def batch_step(carry, sub):
            params, a_opt, c_opt, action_data = carry
            r_idx, r_critic, r_idx2, r_bc = jax.random.split(sub, 4)
            inds = replay_sample_indices(r_idx, replay, self.batch_size)
            obs_b = {"state": replay.data["obs"][inds]}
            next_obs_b = {"state": replay.data["next_obs"][inds]}
            actions_b = action_data[inds]
            rewards_b = replay.data["rewards"][inds]
            term_b = replay.data["terminated"][inds]

            loss_critic, c_grads = jax.value_and_grad(model.loss_critic)(
                params.critic, params, obs_b, next_obs_b, actions_b,
                rewards_b, term_b, self.gamma, r_critic,
            )
            c_updates, c_opt = self.critic_optimizer.update(
                c_grads, c_opt, params.critic
            )
            params = params._replace(
                critic=optax.apply_updates(params.critic, c_updates)
            )

            # action-gradient buffer improvement + actor BC
            inds2 = replay_sample_indices(r_idx2, replay, self.batch_size)
            obs_b2 = {"state": replay.data["obs"][inds2]}
            actions_b2 = action_data[inds2]
            guided = self._improve_actions(params, obs_b2, actions_b2)
            action_data = action_data.at[inds2].set(guided)

            loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
                params.actor, r_bc, guided, obs_b2
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
            params = model.update_target_actor(params, self.target_ema_rate)
            return (params, a_opt, c_opt, action_data), jnp.stack(
                [loss_actor, loss_critic]
            )

        rngs = jax.random.split(rng, self.num_batch)
        (params, actor_opt, critic_opt, action_data), losses = jax.lax.scan(
            batch_step, (state.params, actor_opt, critic_opt, action_data), rngs
        )
        new_replay = replay._replace(
            data={**replay.data, "actions": action_data}
        )
        return DIPOState(params, actor_opt, critic_opt), new_replay, losses.mean(0)

    def _do_update(self):
        self.state, self.replay, losses = self._jit_update(
            self.state, self.replay, self.next_rng(),
            jnp.asarray(self.itr, jnp.int32),
        )
        return {
            "loss_actor": float(losses[0]),
            "loss_critic": float(losses[1]),
        }
