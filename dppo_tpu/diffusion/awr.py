"""Advantage-weighted regression (AWR) for diffusion policies.

Parity with `model/diffusion/diffusion_awr.py` (AWRDiffusion:14):
RWR actor loss + a TD(λ)-target critic MSE (`loss_critic:28`).

Documented deviation: the reference's agent passes a (B,) TD target against
its critic's (B, 1) output (`train_awr_diffusion_agent.py:265`), which
torch silently broadcasts into a (B, B) pairwise MSE — a degenerate
objective whose minimizer is the batch-mean target. Here predictions pair
with their own targets (tests/test_reference_parity_unet.py pins both the
agreement under matched shapes and the reference quirk itself).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.rwr import RWRDiffusion


class AWRParams(NamedTuple):
    actor: Any
    critic: Any


class AWRDiffusion(RWRDiffusion):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic = critic

    def init_awr_params(self, rng, cond: dict) -> AWRParams:
        r_actor, r_critic = jax.random.split(rng)
        return AWRParams(
            actor=self.load_params(r_actor, cond=cond),
            critic=self.critic.init(r_critic, cond),
        )

    def loss_critic(self, critic_params, obs, td_targets):
        pred = self.critic.apply(critic_params, obs).reshape(-1)
        return jnp.mean((pred - td_targets) ** 2)

    def critic_value(self, params: AWRParams, cond) -> jnp.ndarray:
        return self.critic.apply(params.critic, cond).reshape(-1)
