"""GMM policy MLP head (flax.linen).

Parity with `model/common/mlp_gmm.py` (GMM_MLP:11): separate mean / logvar /
mode-weight heads; tanh-squashed means; fixed or learnable per-(dim, mode)
std. Returns (means (B, M, Ta*Da), scales (B, M, Ta*Da), logits (B, M)).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import MLP, ResidualMLP


class GMMMLP(nn.Module):
    action_dim: int
    horizon_steps: int
    cond_dim: Optional[int] = None
    mlp_dims: Sequence[int] = (256, 256, 256)
    num_modes: int = 5
    activation_type: str = "Mish"
    residual_style: bool = False
    use_layernorm: bool = False
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0

    @nn.compact
    def __call__(self, cond):
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        M = self.num_modes
        out_dim = self.action_dim * self.horizon_steps
        model = ResidualMLP if self.residual_style else MLP
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)
        kw = dict(
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
        )
        mean = model([self.cond_dim] + list(self.mlp_dims) + [out_dim * M], **kw)(
            state
        )
        mean = jnp.tanh(mean).reshape(B, M, out_dim)
        if self.fixed_std is None:
            logvar = model(
                [self.cond_dim] + list(self.mlp_dims) + [out_dim * M], **kw
            )(state)
            logvar = jnp.clip(
                logvar.reshape(B, M, out_dim), logvar_min, logvar_max
            )
            scale = jnp.exp(0.5 * logvar)
        elif self.learn_fixed_std:
            logvar = self.param(
                "logvar",
                lambda rng: jnp.full(
                    (self.action_dim * M,),
                    math.log(self.fixed_std**2),
                    dtype=jnp.float32,
                ),
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar).reshape(1, M, self.action_dim)
            scale = jnp.tile(scale, (B, 1, self.horizon_steps))
        else:
            scale = jnp.full((B, M, out_dim), self.fixed_std)
        logits = model([self.cond_dim] + list(self.mlp_dims) + [M], **kw)(state)
        return mean, scale, logits
