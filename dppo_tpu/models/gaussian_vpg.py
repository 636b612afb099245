"""VPG Gaussian: frozen base actor + trainable fine-tune clone.

Parity with `model/rl/gaussian_vpg.py` (VPG_Gaussian:12): forward with
use_base_policy dispatch (:37-48), `get_logprobs` returning per-sample mean
log-prob over flattened dims plus entropy and mean std (:50-66).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.models.gaussian import (
    GaussianModel,
    normal_entropy,
    normal_logprob,
)


class GaussianParams(NamedTuple):
    actor: Any  # frozen base
    actor_ft: Any  # trainable
    critic: Any


class VPGGaussian(GaussianModel):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic = critic

    def init_vpg_params(self, rng, cond: dict) -> GaussianParams:
        r_actor, r_critic = jax.random.split(rng)
        actor_params = self.load_params(r_actor, cond=cond)
        return GaussianParams(
            actor=actor_params,
            actor_ft=jax.tree_util.tree_map(jnp.copy, actor_params),
            critic=self.critic.init(r_critic, cond),
        )

    def sample(
        self,
        params: GaussianParams,
        cond,
        rng,
        deterministic: bool = False,
        use_base_policy: bool = False,
    ):
        actor = params.actor if use_base_policy else params.actor_ft
        return super().forward(actor, cond, rng, deterministic=deterministic)

    forward = sample
    __call__ = sample

    def get_logprobs(
        self,
        params: GaussianParams,
        cond,
        actions,
        use_base_policy: bool = False,
    ):
        B = actions.shape[0]
        actor = params.actor if use_base_policy else params.actor_ft
        mean, scale = self.forward_train(actor, cond, deterministic=False)
        logprob = normal_logprob(actions.reshape(B, -1), mean, scale).mean(-1)
        # per-element mean (torch dist.entropy().mean(), gaussian_vpg.py:64)
        entropy = normal_entropy(scale).mean()
        std = scale.mean()
        return logprob, entropy, std

    def critic_value(self, params: GaussianParams, cond) -> jnp.ndarray:
        return self.critic.apply(params.critic, cond).reshape(-1)
