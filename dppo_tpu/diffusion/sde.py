"""VP-SDE with discrete DDPM betas, reverse SDE/ODE drift, prior log-prob.

Parity with `model/diffusion/sde_lib.py` (get_score_fn:13, SDE:49,
VPSDE:158): betas come from the DDPM cosine schedule clamped at `min_beta`;
the score is recovered from the ε-prediction as −ε/√(1−ᾱ_t); the
reverse-time drift is f(x,t) − g(t)² · score · (½ if probability-flow else 1).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp


class VPSDE:
    def __init__(self, N: int = 1000, **kwargs: Any):
        self.N = int(N)
        self.T = 1.0

    def set_betas(self, betas: jnp.ndarray, min_beta: float = 0.01):
        self.discrete_betas = jnp.clip(jnp.asarray(betas), min_beta, None)
        self.alphas = 1.0 - self.discrete_betas
        self.sqrt_alphas = jnp.sqrt(self.alphas)
        self.alphas_bar = jnp.cumprod(self.alphas)
        self.sqrt_1m_alpha_bar = jnp.sqrt(1.0 - self.alphas_bar)

    def sde(self, x, t):
        """t: (B,) int timesteps. dx = -1/2 β(t) x dt + sqrt(β(t)) dW."""
        beta_t = self.discrete_betas[t]
        drift = -0.5 * beta_t[:, None, None] * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def score_from_eps(self, eps, t, predict_epsilon: bool = True, x=None):
        if predict_epsilon:
            std = self.sqrt_1m_alpha_bar[t]
            return -eps / std[:, None, None]
        # model predicts mu: recover score (parity: get_score_fn:36-41)
        return -(
            x - eps * self.sqrt_alphas[t][:, None, None]
        ) / self.discrete_betas[t][:, None, None]

    def reverse_drift(
        self, x, t, eps_pred, predict_epsilon: bool = True,
        probability_flow: bool = False,
    ):
        drift, diffusion = self.sde(x, t)
        score = self.score_from_eps(eps_pred, t, predict_epsilon, x)
        factor = 0.5 if probability_flow else 1.0
        return drift - diffusion[:, None, None] ** 2 * score * factor

    def prior_logp(self, z):
        n = z.shape[-1] * z.shape[-2]
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(
            z**2, axis=(-1, -2)
        ) / 2.0
