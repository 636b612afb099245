"""PPO loss for GMM policies (parity: `model/rl/gmm_ppo.py` PPO_GMM:19)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.models.gmm_vpg import GMMParams, VPGGMM


class PPOGMM(VPGGMM):
    def __init__(
        self,
        clip_ploss_coef: float,
        clip_vloss_coef: Optional[float] = None,
        norm_adv: bool = True,
        **kwargs: Any,
    ):
        super().__init__(**kwargs)
        self.clip_ploss_coef = clip_ploss_coef
        self.clip_vloss_coef = clip_vloss_coef
        self.norm_adv = norm_adv

    def loss(
        self,
        params: GMMParams,
        obs,
        actions,
        returns,
        oldvalues,
        advantages,
        oldlogprobs,
        use_bc_loss: bool = False,
        bc_rng=None,
        **kwargs,
    ):
        newlogprobs, entropy, std = self.get_logprobs(params, obs, actions)
        newlogprobs = jnp.clip(newlogprobs, -5.0, 2.0)
        oldlogprobs = jnp.clip(oldlogprobs, -5.0, 2.0)
        entropy_loss = -entropy
        bc_loss = jnp.asarray(0.0)
        if use_bc_loss:
            assert bc_rng is not None
            samples = self.sample(
                params, obs, bc_rng, deterministic=False, use_base_policy=True
            )
            bc_logprobs, _, _ = self.get_logprobs(
                params, obs, jax.lax.stop_gradient(samples)
            )
            bc_loss = -jnp.clip(bc_logprobs, -5.0, 2.0).mean()

        logratio = newlogprobs - oldlogprobs
        ratio = jnp.exp(logratio)
        approx_kl = jax.lax.stop_gradient(jnp.mean((ratio - 1.0) - logratio))
        clipfrac = jax.lax.stop_gradient(
            jnp.mean(
                (jnp.abs(ratio - 1.0) > self.clip_ploss_coef).astype(jnp.float32)
            )
        )
        if self.norm_adv:
            advantages = (advantages - advantages.mean()) / (
                advantages.std(ddof=1) + 1e-8
            )
        pg_loss1 = -advantages * ratio
        pg_loss2 = -advantages * jnp.clip(
            ratio, 1.0 - self.clip_ploss_coef, 1.0 + self.clip_ploss_coef
        )
        pg_loss = jnp.mean(jnp.maximum(pg_loss1, pg_loss2))
        newvalues = self.critic.apply(params.critic, obs).reshape(-1)
        if self.clip_vloss_coef is not None:
            v_unclipped = (newvalues - returns) ** 2
            v_clipped_pred = oldvalues + jnp.clip(
                newvalues - oldvalues, -self.clip_vloss_coef, self.clip_vloss_coef
            )
            v_loss = 0.5 * jnp.mean(
                jnp.maximum(v_unclipped, (v_clipped_pred - returns) ** 2)
            )
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
            std,
        )
