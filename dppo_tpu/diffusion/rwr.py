"""Reward-weighted regression (RWR) for diffusion policies.

Parity with `model/diffusion/diffusion_rwr.py` (RWRDiffusion:17):
reward-weighted ε-MSE (`p_losses:35`) and a DDPM sampler with a minimum
sampling std floor for exploration (`forward:64`). DDIM unsupported (same
as reference).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.core import DiffusionModel, Sample, _randn_clipped


class RWRDiffusion(DiffusionModel):
    def __init__(
        self,
        use_ddim: bool = False,
        min_sampling_denoising_std: float = 0.1,
        **kwargs: Any,
    ):
        super().__init__(use_ddim=use_ddim, **kwargs)
        assert not self.use_ddim, "RWR does not support DDIM"
        self.min_sampling_denoising_std = min_sampling_denoising_std

    # ---------- RL training ----------
    def loss(self, params, rng, x_start, cond, rewards):
        """Per-sample reward-weighted ε-MSE with uniform random t."""
        B = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.denoising_steps)
        noise = jax.random.normal(rng_n, x_start.shape)
        x_noisy = self.q_sample(x_start, t, noise)
        x_recon = self.network.apply(params, x_noisy, t, cond)
        target = noise if self.predict_epsilon else x_start
        per_sample = jnp.mean((x_recon - target) ** 2, axis=(-1, -2))
        return jnp.mean(per_sample * rewards)

    # ---------- sampling ----------
    def forward(self, params, cond, rng, deterministic: bool = False):
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        K = self.denoising_steps
        t_all = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)
        rng, xr = jax.random.split(rng)
        x = jax.random.normal(xr, (B, self.horizon_steps, self.action_dim))

        def step(carry, it):
            x, rng = carry
            i, t = it
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            mean, logvar = self.p_mean_var(params, x, t_b, cond)
            std = jnp.exp(0.5 * logvar)
            if deterministic:
                std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
            else:
                std = jnp.clip(std, self.min_sampling_denoising_std, None)
            rng, nr = jax.random.split(rng)
            noise = _randn_clipped(nr, x.shape, self.randn_clip_value)
            x = mean + std * noise
            if self.final_action_clip_value is not None:
                x = jnp.where(
                    i == K - 1,
                    jnp.clip(
                        x,
                        -self.final_action_clip_value,
                        self.final_action_clip_value,
                    ),
                    x,
                )
            return (x, rng), None

        (x, _), _ = jax.lax.scan(
            step, (x, rng), (jnp.arange(K, dtype=jnp.int32), t_all)
        )
        return x

    sample = forward
    __call__ = forward
