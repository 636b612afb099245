"""RWR for Gaussian policy (parity: `model/rl/gaussian_rwr.py` RWR_Gaussian:14)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from dppo_tpu.models.gaussian import GaussianModel, normal_logprob


class RWRGaussian(GaussianModel):
    def __init__(self, actor, **kwargs: Any):
        super().__init__(network=actor, **kwargs)

    def loss(self, params, actions, obs, reward_weights):
        B = actions.shape[0]
        mean, scale = self.forward_train(params, obs)
        log_prob = normal_logprob(actions.reshape(B, -1), mean, scale).mean(-1)
        return -jnp.mean(log_prob * reward_weights)
