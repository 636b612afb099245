"""DIPO — model-free online RL with a DIffusion POlicy.

Parity with `model/diffusion/diffusion_dipo.py` (DIPODiffusion:16): double-Q
TD critic + target critic, target actor used for sampling, Polyak updates
for both (`update_target_actor:84`). The action-gradient replay lives in the
agent (`train_dipo_diffusion_agent.py`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import DQLDiffusion, polyak


class DIPOParams(NamedTuple):
    actor: Any
    actor_target: Any
    critic: Any
    critic_target: Any


class DIPODiffusion(DQLDiffusion):
    def init_dipo_params(self, rng, cond: dict, example_action) -> DIPOParams:
        r_actor, r_critic = jax.random.split(rng)
        actor_params = self.load_params(r_actor, cond=cond)
        critic_params = self.critic.init(r_critic, cond, example_action)
        return DIPOParams(
            actor=actor_params,
            actor_target=jax.tree_util.tree_map(jnp.copy, actor_params),
            critic=critic_params,
            critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
        )

    def forward(self, params: DIPOParams, cond, rng, deterministic: bool = False):
        """Sample with the TARGET actor (parity: :95-135)."""
        return jax.lax.stop_gradient(
            self._chain(params.actor_target, cond, rng, deterministic)
        )

    sample = forward
    __call__ = forward

    def loss_critic(
        self, critic_params, params: DIPOParams, obs, next_obs, actions,
        rewards, terminated, gamma, rng,
    ):
        q1, q2 = self.critic.apply(critic_params, obs, actions)
        next_actions = jax.lax.stop_gradient(
            self._chain(params.actor_target, next_obs, rng, deterministic=False)
        )
        nq1, nq2 = self.critic.apply(params.critic_target, next_obs, next_actions)
        next_q = jnp.minimum(nq1, nq2)
        mask = 1.0 - terminated.reshape(-1)
        target_q = jax.lax.stop_gradient(
            rewards.reshape(-1) + gamma * next_q.reshape(-1) * mask
        )
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

    def loss_actor(self, actor_params, rng, actions_improved, obs):
        """BC toward the gradient-improved buffer actions (agent-side DIPO)."""
        return self.bc_loss(actor_params, rng, actions_improved, obs)

    def action_gradient(self, params: DIPOParams, obs, actions):
        """∂(min Q)/∂a for the action-gradient buffer updates."""

        def q_of_a(a):
            q1, q2 = self.critic.apply(params.critic, obs, a)
            return jnp.sum(jnp.minimum(q1, q2))

        return jax.grad(q_of_a)(actions)

    def update_target_critic(self, params: DIPOParams, tau) -> DIPOParams:
        return params._replace(
            critic_target=polyak(params.critic_target, params.critic, tau)
        )

    def update_target_actor(self, params: DIPOParams, tau) -> DIPOParams:
        return params._replace(
            actor_target=polyak(params.actor_target, params.actor, tau)
        )
