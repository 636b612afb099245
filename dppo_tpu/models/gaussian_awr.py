"""AWR for Gaussian policy (parity: `model/rl/gaussian_awr.py` AWR_Gaussian:13)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.models.gaussian_rwr import RWRGaussian


class AWRGaussianParams(NamedTuple):
    actor: Any
    critic: Any


class AWRGaussian(RWRGaussian):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(actor=actor, **kwargs)
        self.critic = critic

    def init_awr_params(self, rng, cond: dict) -> AWRGaussianParams:
        r_actor, r_critic = jax.random.split(rng)
        return AWRGaussianParams(
            actor=self.load_params(r_actor, cond=cond),
            critic=self.critic.init(r_critic, cond),
        )

    def loss_critic(self, critic_params, obs, advantages):
        pred = self.critic.apply(critic_params, obs).reshape(-1)
        return jnp.mean((pred - advantages) ** 2)

    def critic_value(self, params: AWRGaussianParams, cond) -> jnp.ndarray:
        return self.critic.apply(params.critic, cond).reshape(-1)
