"""IDQL — implicit diffusion Q-learning.

Parity with `model/diffusion/diffusion_idql.py` (IDQLDiffusion:23):
expectile V loss (`expectile_loss:18`, `loss_critic_v:56`), Q TD loss toward
r + γV(s') (`loss_critic_q:63`), plain BC diffusion loss (`p_losses:98`),
and inference that samples `num_sample` candidate chains and picks by
argmax-Q (eval) or expectile-weighted sampling (exploration)
(`forward:125-189`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.diffusion.rwr import RWRDiffusion


def expectile_loss(diff, expectile: float = 0.8):
    weight = jnp.where(diff > 0, expectile, 1.0 - expectile)
    return weight * diff**2


class IDQLParams(NamedTuple):
    actor: Any
    critic_q: Any
    target_q: Any
    critic_v: Any


class IDQLDiffusion(RWRDiffusion):
    def __init__(self, actor, critic_q, critic_v, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic_q = critic_q
        self.critic_v = critic_v

    def init_idql_params(self, rng, cond: dict, example_action) -> IDQLParams:
        r_actor, r_q, r_v = jax.random.split(rng, 3)
        q_params = self.critic_q.init(r_q, cond, example_action)
        return IDQLParams(
            actor=self.load_params(r_actor, cond=cond),
            critic_q=q_params,
            target_q=jax.tree_util.tree_map(jnp.copy, q_params),
            critic_v=self.critic_v.init(r_v, cond),
        )

    # ---------- critics ----------
    def compute_advantages(self, params: IDQLParams, v_params, obs, actions):
        q1, q2 = self.critic_q.apply(params.target_q, obs, actions)
        q = jax.lax.stop_gradient(jnp.minimum(q1, q2))
        v = self.critic_v.apply(v_params, obs).reshape(-1)
        return q - v

    def loss_critic_v(self, v_params, params: IDQLParams, obs, actions):
        adv = self.compute_advantages(params, v_params, obs, actions)
        return expectile_loss(adv).mean()

    def loss_critic_q(
        self, q_params, params: IDQLParams, obs, next_obs, actions, rewards,
        terminated, gamma,
    ):
        q1, q2 = self.critic_q.apply(q_params, obs, actions)
        next_v = jax.lax.stop_gradient(
            self.critic_v.apply(params.critic_v, next_obs).reshape(-1)
        )
        mask = 1.0 - terminated.reshape(-1)
        target = rewards.reshape(-1) + gamma * next_v * mask
        return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

    def update_target_critic(self, params: IDQLParams, tau) -> IDQLParams:
        return params._replace(
            target_q=polyak(params.target_q, params.critic_q, tau)
        )

    # ---------- BC loss (unweighted, parity p_losses:98) ----------
    def loss(self, actor_params, rng, x_start, cond):
        B = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.denoising_steps)
        noise = jax.random.normal(rng_n, x_start.shape)
        x_noisy = self.q_sample(x_start, t, noise)
        x_recon = self.network.apply(actor_params, x_noisy, t, cond)
        target = noise if self.predict_epsilon else x_start
        return jnp.mean((x_recon - target) ** 2)

    # ---------- inference ----------
    def sample(
        self,
        params: IDQLParams,
        cond,
        rng,
        deterministic: bool = False,
        num_sample: int = 10,
        critic_hyperparam: float = 0.7,
        use_expectile_exploration: bool = True,
    ):
        B, T, D = cond["state"].shape
        S = num_sample
        cond_rep = {
            "state": jnp.tile(cond["state"][None], (S, 1, 1, 1)).reshape(
                S * B, T, D
            )
        }
        rng, sample_rng, pick_rng = jax.random.split(rng, 3)
        samples = super().forward(
            params.actor, cond_rep, sample_rng, deterministic=deterministic
        )  # (S*B, Ta, Da)
        H, A = samples.shape[-2:]
        q1, q2 = self.critic_q.apply(params.target_q, cond_rep, samples)
        q = jnp.minimum(q1, q2).reshape(S, B)
        samples_expanded = samples.reshape(S, B, H, A)
        if deterministic or not use_expectile_exploration:
            best = jnp.argmax(q, axis=0)  # (B,)
        else:
            v = self.critic_v.apply(params.critic_v, cond_rep).reshape(S, B)
            adv = q - v
            tau_w = jnp.where(adv > 0, critic_hyperparam, 1 - critic_hyperparam)
            tau_w = tau_w / tau_w.sum(0)
            best = jax.random.categorical(pick_rng, jnp.log(tau_w.T), axis=-1)
        return samples_expanded[best, jnp.arange(B)]

    forward = sample
    __call__ = sample
