"""DDPM/DDIM schedule tables, precomputed once as jnp arrays.

Numerical parity with the reference's table construction:
  - cosine beta schedule: `model/diffusion/sampling.py:10-20`
  - DDPM derived tables: `model/diffusion/diffusion.py:98-148`
  - DDIM sub-schedule ("leading"/uniform discretization, eta=0 sigmas,
    flipped to sampling order): `model/diffusion/diffusion.py:155-196`

All tables are float32 and shaped (K,) (or (K_ddim,) for DDIM), indexed by
the *timestep* t for DDPM and by the *sampling index* i for DDIM (after the
flip, index 0 is the first, noisiest sampling step).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, a_min=0, a_max=0.999).astype(np.float32)


class DDPMTables(NamedTuple):
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    ddpm_var: jnp.ndarray
    ddpm_logvar_clipped: jnp.ndarray
    ddpm_mu_coef1: jnp.ndarray
    ddpm_mu_coef2: jnp.ndarray


class DDIMTables(NamedTuple):
    # all flipped to sampling order: index 0 <-> largest timestep
    t: jnp.ndarray  # (K_ddim,) int32 timesteps used at each sampling index
    alphas: jnp.ndarray
    alphas_sqrt: jnp.ndarray
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray  # eta=0 fixed sigmas (all zeros)


def make_ddpm_tables(denoising_steps: int) -> DDPMTables:
    betas = cosine_beta_schedule(denoising_steps)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]]).astype(
        np.float32
    )
    ddpm_var = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    return DDPMTables(
        betas=jnp.asarray(betas),
        alphas=jnp.asarray(alphas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        alphas_cumprod_prev=jnp.asarray(alphas_cumprod_prev),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        ddpm_var=jnp.asarray(ddpm_var),
        ddpm_logvar_clipped=jnp.asarray(np.log(np.clip(ddpm_var, 1e-20, None))),
        ddpm_mu_coef1=jnp.asarray(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        ddpm_mu_coef2=jnp.asarray(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def make_ddim_tables(
    denoising_steps: int, ddim_steps: int, discretize: str = "uniform"
) -> DDIMTables:
    if discretize != "uniform":
        raise ValueError(f"unknown DDIM discretization: {discretize}")
    betas = cosine_beta_schedule(denoising_steps)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    step_ratio = denoising_steps // ddim_steps
    t = np.arange(0, ddim_steps) * step_ratio  # "leading" style
    ddim_alphas = alphas_cumprod[t].astype(np.float32)
    ddim_alphas_prev = np.concatenate([[1.0], alphas_cumprod[t[:-1]]]).astype(
        np.float32
    )
    ddim_sigmas = np.zeros_like(ddim_alphas)  # eta = 0 at construction
    # flip to sampling order
    flip = lambda a: np.ascontiguousarray(a[::-1])
    return DDIMTables(
        t=jnp.asarray(flip(t).astype(np.int32)),
        alphas=jnp.asarray(flip(ddim_alphas)),
        alphas_sqrt=jnp.asarray(flip(np.sqrt(ddim_alphas))),
        alphas_prev=jnp.asarray(flip(ddim_alphas_prev)),
        sqrt_one_minus_alphas=jnp.asarray(flip(np.sqrt(1.0 - ddim_alphas))),
        sigmas=jnp.asarray(flip(ddim_sigmas)),
    )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-t coefficients and broadcast to an ndim-rank batch shape.

    Parity with `sampling.py:23-26` (gather + reshape to (B, 1, ..., 1)).
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
