"""IBRL — imitation-bootstrapped RL, Gaussian policy.

Parity with `model/rl/gaussian_ibrl.py` (IBRL_Gaussian:16): frozen BC policy
+ online RL actor + target actor; critic ensemble (vmapped); TD targets take
the max of the BC-proposal and RL-proposal Q values (`loss_critic:69`);
actor maximizes the ensemble-min Q (`loss_actor:115`); action selection
picks between BC and RL proposals greedily or with exp(βQ) soft sampling
(`forward:149`).

Intentional deviation: the reference soft-samples with probabilities
softmax(exp(β·Q)) — a double exponential that overflows for large Q
(`gaussian_ibrl.py:186-193`); we use the evidently-intended softmax(β·Q).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.models.gaussian import GaussianModel


class IBRLParams(NamedTuple):
    bc_policy: Any  # frozen pretrained actor
    actor: Any  # online RL actor
    actor_target: Any
    critic_ensemble: Any
    target_ensemble: Any


class IBRLGaussian(GaussianModel):
    def __init__(
        self,
        actor,
        critic,
        n_critics: int,
        soft_action_sample: bool = False,
        soft_action_sample_beta: float = 10.0,
        **kwargs: Any,
    ):
        super().__init__(network=actor, **kwargs)
        self.critic = critic
        self.n_critics = int(n_critics)
        self.soft_action_sample = soft_action_sample
        self.soft_action_sample_beta = soft_action_sample_beta

    def init_ibrl_params(self, rng, cond: dict, example_action) -> IBRLParams:
        r_actor, r_crit = jax.random.split(rng)
        actor_params = self.load_params(r_actor, cond=cond)
        crit_rngs = jax.random.split(r_crit, self.n_critics)
        ensemble = jax.vmap(
            lambda r: self.critic.init(r, cond, example_action)
        )(crit_rngs)
        return IBRLParams(
            bc_policy=jax.tree_util.tree_map(jnp.copy, actor_params),
            actor=actor_params,
            actor_target=jax.tree_util.tree_map(jnp.copy, actor_params),
            critic_ensemble=ensemble,
            target_ensemble=jax.tree_util.tree_map(jnp.copy, ensemble),
        )

    def _apply_ensemble(self, ensemble, obs, actions):
        return jax.vmap(lambda p: self.critic.apply(p, obs, actions))(ensemble)

    def _two_member_min(self, rng, ensemble, obs, actions):
        perm = jax.random.permutation(rng, self.n_critics)
        q_all = self._apply_ensemble(ensemble, obs, actions)
        return jnp.minimum(q_all[perm[0]], q_all[perm[1]])

    def loss_critic(
        self, ensemble_params, params: IBRLParams, obs, next_obs, actions,
        rewards, terminated, gamma, rng,
    ):
        r_bc, r_rl, r_ind = jax.random.split(rng, 3)
        next_actions_bc = jax.lax.stop_gradient(
            super().forward(
                params.bc_policy, next_obs, r_bc, deterministic=True
            )
        )
        next_actions_rl = jax.lax.stop_gradient(
            super().forward(
                params.actor_target, next_obs, r_rl, deterministic=False
            )
        )
        next_q_bc = self._two_member_min(
            r_ind, params.target_ensemble, next_obs, next_actions_bc
        )
        next_q_rl = self._two_member_min(
            r_ind, params.target_ensemble, next_obs, next_actions_rl
        )
        next_q = jnp.maximum(next_q_bc, next_q_rl)
        target_q = jax.lax.stop_gradient(
            rewards + gamma * (1.0 - terminated) * next_q
        )
        current_q = self._apply_ensemble(ensemble_params, obs, actions)
        return jnp.mean((current_q - target_q[None]) ** 2)

    def loss_actor(self, actor_params, params: IBRLParams, obs, rng):
        action = super().forward(
            actor_params, obs, rng, deterministic=False
        )
        current_q = self._apply_ensemble(params.critic_ensemble, obs, action)
        return -jnp.mean(current_q.min(axis=0))

    def update_target_critic(self, params: IBRLParams, tau) -> IBRLParams:
        return params._replace(
            target_ensemble=polyak(
                params.target_ensemble, params.critic_ensemble, tau
            )
        )

    def update_target_actor(self, params: IBRLParams, tau) -> IBRLParams:
        return params._replace(
            actor_target=polyak(params.actor_target, params.actor, tau)
        )

    def sample(self, params: IBRLParams, cond, rng, deterministic: bool = False):
        """Propose from both BC and RL policies, pick by critic Q."""
        r_bc, r_rl, r_ind, r_pick = jax.random.split(rng, 4)
        bc_action = super().forward(
            params.bc_policy, cond, r_bc, deterministic=True
        )
        rl_action = super().forward(
            params.actor, cond, r_rl, deterministic=deterministic
        )
        q_bc = self._two_member_min(
            r_ind, params.critic_ensemble, cond, bc_action
        )
        q_rl = self._two_member_min(
            r_ind, params.critic_ensemble, cond, rl_action
        )
        if deterministic or not self.soft_action_sample:
            pick_bc = (q_bc > q_rl)[:, None, None]
        else:
            logits = jnp.stack(
                [q_bc, q_rl], axis=-1
            ) * self.soft_action_sample_beta
            pick = jax.random.categorical(r_pick, logits, axis=-1)
            pick_bc = (pick == 0)[:, None, None]
        return jnp.where(pick_bc, bc_action, rl_action)

    __call__ = sample
