"""RLPD — RL with prior data, Gaussian policy + critic ensemble.

Parity with `model/rl/gaussian_rlpd.py` (RLPD_Gaussian:18): an ensemble of
`n_critics` critics (the reference stacks module states and `torch.vmap`s;
here the ensemble is a vmapped flax init/apply — the idiomatic JAX form),
TD targets from the min over two randomly-chosen target ensemble members,
optional entropy backup, mean-over-ensemble actor objective, temperature
loss, Polyak targets.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.models.gaussian import GaussianModel


class RLPDParams(NamedTuple):
    actor: Any
    critic_ensemble: Any  # leaves stacked on leading n_critics axis
    target_ensemble: Any
    log_alpha: Any


class RLPDGaussian(GaussianModel):
    def __init__(self, actor, critic, n_critics: int, backup_entropy: bool = False,
                 **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic = critic
        self.n_critics = int(n_critics)
        self.backup_entropy = backup_entropy

    def init_rlpd_params(
        self, rng, cond: dict, example_action, init_temperature: float = 1.0
    ) -> RLPDParams:
        r_actor, r_crit = jax.random.split(rng)
        crit_rngs = jax.random.split(r_crit, self.n_critics)
        ensemble = jax.vmap(
            lambda r: self.critic.init(r, cond, example_action)
        )(crit_rngs)
        return RLPDParams(
            actor=self.load_params(r_actor, cond=cond),
            critic_ensemble=ensemble,
            target_ensemble=jax.tree_util.tree_map(jnp.copy, ensemble),
            log_alpha=jnp.log(jnp.asarray(init_temperature)),
        )

    def _apply_ensemble(self, ensemble, obs, actions):
        return jax.vmap(
            lambda p: self.critic.apply(p, obs, actions)
        )(ensemble)  # (n_critics, B)

    def loss_critic(
        self, ensemble_params, params: RLPDParams, obs, next_obs, actions,
        rewards, terminated, gamma, alpha, rng,
    ):
        r_act, r_ind = jax.random.split(rng)
        next_actions, next_logprobs = self.forward(
            params.actor, next_obs, r_act, deterministic=False, get_logprob=True
        )
        next_actions = jax.lax.stop_gradient(next_actions)
        next_logprobs = jax.lax.stop_gradient(next_logprobs)
        perm = jax.random.permutation(r_ind, self.n_critics)
        target_q_all = self._apply_ensemble(
            params.target_ensemble, next_obs, next_actions
        )
        next_q = jnp.minimum(target_q_all[perm[0]], target_q_all[perm[1]])
        target_q = rewards + gamma * (1.0 - terminated) * next_q
        if self.backup_entropy:
            target_q = target_q + gamma * (1.0 - terminated) * alpha * (
                -next_logprobs
            )
        target_q = jax.lax.stop_gradient(target_q)
        current_q = self._apply_ensemble(ensemble_params, obs, actions)
        return jnp.mean((current_q - target_q[None]) ** 2)

    def loss_actor(self, actor_params, params: RLPDParams, obs, alpha, rng):
        action, logprob = self.forward(
            actor_params, obs, rng, deterministic=False, get_logprob=True
        )
        current_q = self._apply_ensemble(params.critic_ensemble, obs, action)
        return -jnp.mean(current_q.mean(axis=0) + alpha * (-logprob))

    def loss_temperature(
        self, log_alpha, params: RLPDParams, obs, target_entropy, rng
    ):
        _, logprob = self.forward(
            params.actor, obs, rng, deterministic=False, get_logprob=True
        )
        logprob = jax.lax.stop_gradient(logprob)
        return -jnp.mean(jnp.exp(log_alpha) * (logprob + target_entropy))

    def update_target_critic(self, params: RLPDParams, tau) -> RLPDParams:
        return params._replace(
            target_ensemble=polyak(
                params.target_ensemble, params.critic_ensemble, tau
            )
        )

    def sample(self, params: RLPDParams, cond, rng, deterministic: bool = False):
        return self.forward(params.actor, cond, rng, deterministic=deterministic)

    __call__ = sample
