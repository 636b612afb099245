"""SAC with tanh-Gaussian policy.

Parity with `model/rl/gaussian_sac.py` (SAC_Gaussian:16): double-Q TD critic
with entropy-regularized targets (:31), reparameterized actor loss (:61),
temperature loss (:72), Polyak target critic (:81). The policy network uses
tanh_output=True squashing applied after sampling (GaussianModel:105-113).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.models.gaussian import GaussianModel


class SACParams(NamedTuple):
    actor: Any
    critic: Any
    critic_target: Any
    log_alpha: Any  # () learnable temperature (log)


class SACGaussian(GaussianModel):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic = critic

    def init_sac_params(
        self, rng, cond: dict, example_action, init_temperature: float = 1.0
    ) -> SACParams:
        r_actor, r_critic = jax.random.split(rng)
        critic_params = self.critic.init(r_critic, cond, example_action)
        return SACParams(
            actor=self.load_params(r_actor, cond=cond),
            critic=critic_params,
            critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
            log_alpha=jnp.log(jnp.asarray(init_temperature)),
        )

    def loss_critic(
        self, critic_params, params: SACParams, obs, next_obs, actions,
        rewards, terminated, gamma, alpha, rng,
    ):
        next_actions, next_logprobs = self.forward(
            params.actor, next_obs, rng, deterministic=False, get_logprob=True
        )
        next_actions = jax.lax.stop_gradient(next_actions)
        next_logprobs = jax.lax.stop_gradient(next_logprobs)
        nq1, nq2 = self.critic.apply(
            params.critic_target, next_obs, next_actions
        )
        next_q = jnp.minimum(nq1, nq2) - alpha * next_logprobs
        target_q = jax.lax.stop_gradient(
            rewards + gamma * next_q * (1.0 - terminated)
        )
        q1, q2 = self.critic.apply(critic_params, obs, actions)
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

    def loss_actor(self, actor_params, params: SACParams, obs, alpha, rng):
        action, logprob = self.forward(
            actor_params, obs, rng, deterministic=False, get_logprob=True
        )
        q1, q2 = self.critic.apply(params.critic, obs, action)
        return jnp.mean(-jnp.minimum(q1, q2) + alpha * logprob)

    def loss_temperature(
        self, log_alpha, params: SACParams, obs, target_entropy, rng
    ):
        _, logprob = self.forward(
            params.actor, obs, rng, deterministic=False, get_logprob=True
        )
        logprob = jax.lax.stop_gradient(logprob)
        return -jnp.mean(jnp.exp(log_alpha) * (logprob + target_entropy))

    def update_target_critic(self, params: SACParams, tau) -> SACParams:
        return params._replace(
            critic_target=polyak(params.critic_target, params.critic, tau)
        )

    def sample(self, params: SACParams, cond, rng, deterministic: bool = False):
        return self.forward(params.actor, cond, rng, deterministic=deterministic)

    __call__ = sample
