"""VPG GMM (parity: `model/rl/gmm_vpg.py` VPG_GMM:6)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.models.gmm import GMMModel, gmm_log_prob, gmm_sample, gmm_stats


class GMMParams(NamedTuple):
    actor: Any
    actor_ft: Any
    critic: Any


class VPGGMM(GMMModel):
    def __init__(self, actor, critic, **kwargs: Any):
        super().__init__(network=actor, **kwargs)
        self.critic = critic

    def init_vpg_params(self, rng, cond: dict) -> GMMParams:
        r_actor, r_critic = jax.random.split(rng)
        actor_params = self.load_params(r_actor, cond=cond)
        return GMMParams(
            actor=actor_params,
            actor_ft=jax.tree_util.tree_map(jnp.copy, actor_params),
            critic=self.critic.init(r_critic, cond),
        )

    def sample(
        self,
        params: GMMParams,
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
        self, params: GMMParams, cond, actions, use_base_policy: bool = False
    ):
        B = actions.shape[0]
        actor = params.actor if use_base_policy else params.actor_ft
        means, scales, logits = self.forward_train(actor, cond)
        logprob = gmm_log_prob(actions.reshape(B, -1), means, scales, logits)
        entropy, std = gmm_stats(means, scales, logits)
        return logprob, entropy, std

    def critic_value(self, params: GMMParams, cond) -> jnp.ndarray:
        return self.critic.apply(params.critic, cond).reshape(-1)
