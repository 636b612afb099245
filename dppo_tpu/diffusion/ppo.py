"""DPPO — PPO on the denoising MDP.

Loss parity with `model/diffusion/diffusion_ppo.py` (PPODiffusion:24,
loss:57-199): logprob clamp [-5, 2] (:93-94), reward-horizon masking (:97-98),
optional BC regularization via a base-policy rollout (:104-126), advantage
normalization + quantile clipping (:129-135), denoising discount
γ_d^(K_ft−i−1) (:138-144), per-denoising-step exponentially interpolated clip
coefficient (:151-159), k3 approx-KL + clipfrac (:162-167), clipped surrogate
(:170-174), optionally clipped value loss (:177-189).

Pure function — returns (total-loss pieces, diagnostics); designed to be the
scalar objective inside a jitted `value_and_grad` over
(actor_ft, critic, eta) leaves of a VPGParams tree.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.vpg import VPGDiffusion, VPGParams


class PPODiffusion(VPGDiffusion):
    def __init__(
        self,
        gamma_denoising: float,
        clip_ploss_coef: float,
        clip_ploss_coef_base: float = 1e-3,
        clip_ploss_coef_rate: float = 3,
        clip_vloss_coef: Optional[float] = None,
        clip_advantage_lower_quantile: float = 0,
        clip_advantage_upper_quantile: float = 1,
        norm_adv: bool = True,
        **kwargs: Any,
    ):
        super().__init__(**kwargs)
        self.gamma_denoising = gamma_denoising
        self.clip_ploss_coef = clip_ploss_coef
        self.clip_ploss_coef_base = clip_ploss_coef_base
        self.clip_ploss_coef_rate = clip_ploss_coef_rate
        self.clip_vloss_coef = clip_vloss_coef
        self.clip_advantage_lower_quantile = clip_advantage_lower_quantile
        self.clip_advantage_upper_quantile = clip_advantage_upper_quantile
        self.norm_adv = norm_adv

    def loss(
        self,
        params: VPGParams,
        obs: dict,
        chains_prev: jnp.ndarray,  # (B, Ta, Da)
        chains_next: jnp.ndarray,  # (B, Ta, Da)
        denoising_inds: jnp.ndarray,  # (B,)
        returns: jnp.ndarray,  # (B,)
        oldvalues: jnp.ndarray,  # (B,)
        advantages: jnp.ndarray,  # (B,)
        oldlogprobs: jnp.ndarray,  # (B, Ta, Da)
        use_bc_loss: bool = False,
        reward_horizon: int = 4,
        bc_rng=None,
    ):
        newlogprobs, eta = self.get_logprobs_subsample(
            params, obs, chains_prev, chains_next, denoising_inds, get_ent=True
        )
        entropy_loss = -jnp.mean(eta)
        newlogprobs = jnp.clip(newlogprobs, -5.0, 2.0)
        oldlogprobs = jnp.clip(oldlogprobs, -5.0, 2.0)

        # only the executed part of the chunk contributes gradient
        newlogprobs = newlogprobs[:, :reward_horizon, :].mean(axis=(-1, -2))
        oldlogprobs = oldlogprobs[:, :reward_horizon, :].mean(axis=(-1, -2))

        bc_loss = jnp.asarray(0.0)
        if use_bc_loss:
            # sample the frozen base policy, then score its chain under the
            # current fine-tuned policy (Eqn. 2, arXiv:2403.03949; parity
            # diffusion_ppo.py:104-126)
            assert bc_rng is not None, "BC loss needs an rng for base rollouts"
            samples = self.sample(
                params,
                obs,
                bc_rng,
                deterministic=False,
                return_chain=True,
                use_base_policy=True,
            )
            bc_logprobs = self.get_logprobs(
                params,
                obs,
                jax.lax.stop_gradient(samples.chains),
                get_ent=False,
                use_base_policy=False,
            )
            bc_logprobs = jnp.clip(bc_logprobs, -5.0, 2.0).mean(axis=(-1, -2))
            bc_loss = -jnp.mean(bc_logprobs)

        if self.norm_adv:
            # ddof=1: torch Tensor.std() is Bessel-corrected; keeping jnp's
            # default ddof=0 skews pg_loss by sqrt(B/(B-1)) vs the reference
            # (caught by tests/test_reference_parity.py)
            advantages = (advantages - advantages.mean()) / (
                advantages.std(ddof=1) + 1e-8
            )
        adv_min = jnp.quantile(
            advantages, float(self.clip_advantage_lower_quantile)
        )
        adv_max = jnp.quantile(
            advantages, float(self.clip_advantage_upper_quantile)
        )
        advantages = jnp.clip(advantages, adv_min, adv_max)

        # denoising discount γ_d^(K_ft - i - 1)
        discount = self.gamma_denoising ** (
            self.ft_denoising_steps - denoising_inds.astype(jnp.float32) - 1.0
        )
        advantages = advantages * discount

        logratio = newlogprobs - oldlogprobs
        ratio = jnp.exp(logratio)

        # exponential interpolation of the clip coefficient over denoise steps
        t_frac = denoising_inds.astype(jnp.float32) / max(
            self.ft_denoising_steps - 1, 1
        )
        if self.ft_denoising_steps > 1:
            clip_coef = self.clip_ploss_coef_base + (
                self.clip_ploss_coef - self.clip_ploss_coef_base
            ) * (jnp.exp(self.clip_ploss_coef_rate * t_frac) - 1.0) / (
                math.exp(self.clip_ploss_coef_rate) - 1.0
            )
        else:
            clip_coef = t_frac

        approx_kl = jax.lax.stop_gradient(jnp.mean((ratio - 1.0) - logratio))
        clipfrac = jax.lax.stop_gradient(
            jnp.mean((jnp.abs(ratio - 1.0) > clip_coef).astype(jnp.float32))
        )

        pg_loss1 = -advantages * ratio
        pg_loss2 = -advantages * jnp.clip(ratio, 1.0 - clip_coef, 1.0 + clip_coef)
        pg_loss = jnp.mean(jnp.maximum(pg_loss1, pg_loss2))

        newvalues = self.critic.apply(params.critic, obs).reshape(-1)
        if self.clip_vloss_coef is not None:
            v_unclipped = (newvalues - returns) ** 2
            v_clipped_pred = oldvalues + jnp.clip(
                newvalues - oldvalues, -self.clip_vloss_coef, self.clip_vloss_coef
            )
            v_clipped = (v_clipped_pred - returns) ** 2
            v_loss = 0.5 * jnp.mean(jnp.maximum(v_unclipped, v_clipped))
        else:
            v_loss = 0.5 * jnp.mean((newvalues - returns) ** 2)
        return (
            pg_loss,
            entropy_loss,
            v_loss,
            clipfrac,
            approx_kl,
            jnp.mean(ratio),
            bc_loss,
            jnp.mean(eta),
        )
