"""QSM — Q-score matching for diffusion policies.

Parity with `model/diffusion/diffusion_qsm.py` (QSMDiffusion:17): actor loss
aligns the predicted noise with ∂Q/∂a evaluated at noisy actions
(`loss_actor:36-63`, with the sign flip: ∂μ/∂ε < 0); double-Q TD critic with
noisy next actions (`loss_critic:65`); Polyak target updates. The torch
autograd.grad on x_noisy becomes `jax.grad` of the summed Q heads.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.diffusion.rwr import RWRDiffusion


class QSMParams(NamedTuple):
    actor: Any
    critic_q: Any
    target_q: Any


class QSMDiffusion(RWRDiffusion):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic_q = critic

    def init_qsm_params(self, rng, cond: dict, example_action) -> QSMParams:
        r_actor, r_q = jax.random.split(rng)
        q_params = self.critic_q.init(r_q, cond, example_action)
        return QSMParams(
            actor=self.load_params(r_actor, cond=cond),
            critic_q=q_params,
            target_q=jax.tree_util.tree_map(jnp.copy, q_params),
        )

    def loss_actor(self, actor_params, params: QSMParams, obs, actions,
                   q_grad_coeff, rng):
        x_start = actions
        B = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.denoising_steps)
        noise = jax.random.normal(rng_n, x_start.shape)
        x_noisy = self.q_sample(x_start, t, noise)

        def q_sum(a):
            q1, q2 = self.critic_q.apply(params.critic_q, obs, a)
            return q1.sum(), q2.sum()

        g1 = jax.grad(lambda a: q_sum(a)[0])(x_noisy)
        g2 = jax.grad(lambda a: q_sum(a)[1])(x_noisy)
        gradient_q = jax.lax.stop_gradient((g1 + g2) / 2.0)

        x_recon = self.network.apply(actor_params, x_noisy, t, obs)
        return jnp.mean((-x_recon - q_grad_coeff * gradient_q) ** 2)

    def loss_critic(
        self, q_params, params: QSMParams, obs, next_obs, actions, rewards,
        terminated, gamma, rng,
    ):
        q1, q2 = self.critic_q.apply(q_params, obs, actions)
        next_actions = jax.lax.stop_gradient(
            super().forward(params.actor, next_obs, rng, deterministic=False)
        )
        nq1, nq2 = self.critic_q.apply(params.target_q, next_obs, next_actions)
        next_q = jnp.minimum(nq1, nq2)
        mask = 1.0 - terminated.reshape(-1)
        target = jax.lax.stop_gradient(
            rewards.reshape(-1) + gamma * next_q.reshape(-1) * mask
        )
        return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

    def update_target_critic(self, params: QSMParams, tau) -> QSMParams:
        return params._replace(
            target_q=polyak(params.target_q, params.critic_q, tau)
        )

    def sample(self, params: QSMParams, cond, rng, deterministic: bool = False):
        return super().forward(params.actor, cond, rng, deterministic=deterministic)

    __call__ = sample
