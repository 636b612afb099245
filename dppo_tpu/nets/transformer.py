"""Transformer policy heads (flax.linen).

Parity with `model/common/transformer.py`: GPT-style encoder-decoder with
time-as-token action decoding — Transformer:217 (cond embedding + learned
positional embeddings, pre-LN decoder layers with cross-attention into the
encoded condition, optional causal masks), Gaussian_Transformer:16 and
GMM_Transformer:102 heads (tanh means, learned/fixed stds, GMM mode head
over the flattened pre-head features).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

normal02 = nn.initializers.normal(stddev=0.02)

# exact erf gelu: torch's transformer layers use F.gelu's default
# (jax defaults to the tanh approximation — same fix as nets/vit.py)
_ACT = {
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
}


class DecoderLayer(nn.Module):
    """Pre-LN transformer decoder layer (self-attn, cross-attn, FFN)."""

    n_emb: int
    n_head: int
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, memory, *, tgt_mask=None, memory_mask=None,
                 deterministic: bool = True):
        act = _ACT[self.activation]
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.n_emb,
            kernel_init=normal02,
        )(h, h, mask=tgt_mask)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.n_emb,
            kernel_init=normal02,
        )(h, memory, mask=memory_mask)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(4 * self.n_emb, kernel_init=normal02)(h)
        h = act(h)
        h = nn.Dense(self.n_emb, kernel_init=normal02)(h)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(h)


class EncoderLayer(nn.Module):
    n_emb: int
    n_head: int
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = _ACT[self.activation]
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.n_emb,
            kernel_init=normal02,
        )(h, h)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(4 * self.n_emb, kernel_init=normal02)(h)
        h = act(h)
        h = nn.Dense(self.n_emb, kernel_init=normal02)(h)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(h)


class Transformer(nn.Module):
    output_dim: int
    horizon: int
    cond_dim: int
    T_cond: int = 1
    n_layer: int = 12
    n_head: int = 12
    n_emb: int = 768
    p_drop_emb: float = 0.0
    p_drop_attn: float = 0.0
    causal_attn: bool = False
    n_cond_layers: int = 0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, cond, *, deterministic: bool = True):
        """cond: (B, T_cond, cond_dim) -> ((B, horizon, output_dim), prehead)."""
        B = cond.shape[0]
        x = nn.Dense(self.n_emb, kernel_init=normal02, name="cond_obs_emb")(cond)
        cond_pos = self.param(
            "cond_pos_emb", normal02, (1, self.T_cond, self.n_emb)
        )
        x = x + cond_pos[:, : x.shape[1]]
        x = nn.Dropout(self.p_drop_emb, deterministic=deterministic)(x)
        if self.n_cond_layers > 0:
            for i in range(self.n_cond_layers):
                x = EncoderLayer(
                    self.n_emb, self.n_head, self.p_drop_attn, self.activation,
                    name=f"enc{i}",
                )(x, deterministic=deterministic)
        else:
            h = nn.Dense(4 * self.n_emb, kernel_init=normal02)(x)
            h = h * jnp.tanh(nn.softplus(h))  # Mish
            x = nn.Dense(self.n_emb, kernel_init=normal02)(h)
        memory = x

        pos = self.param("pos_emb", normal02, (1, self.horizon, self.n_emb))
        x = jnp.broadcast_to(pos, (B, self.horizon, self.n_emb))
        x = nn.Dropout(self.p_drop_emb, deterministic=deterministic)(x)

        tgt_mask = None
        memory_mask = None
        if self.causal_attn:
            tgt_mask = jnp.tril(
                jnp.ones((self.horizon, self.horizon), dtype=bool)
            )[None, None]
            t = jnp.arange(self.horizon)[:, None]
            s = jnp.arange(self.T_cond)[None, :]
            memory_mask = (t >= (s - 1))[None, None]
        for i in range(self.n_layer):
            x = DecoderLayer(
                self.n_emb, self.n_head, self.p_drop_attn, self.activation,
                name=f"dec{i}",
            )(
                x, memory, tgt_mask=tgt_mask, memory_mask=memory_mask,
                deterministic=deterministic,
            )
        prehead = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        out = nn.Dense(self.output_dim, kernel_init=normal02, name="head")(
            prehead
        )
        return out, prehead


class GaussianTransformer(nn.Module):
    action_dim: int
    horizon_steps: int
    cond_dim: int
    transformer_embed_dim: int = 256
    transformer_num_heads: int = 8
    transformer_num_layers: int = 6
    transformer_activation: str = "gelu"
    p_drop_emb: float = 0.0
    p_drop_attn: float = 0.0
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0

    @nn.compact
    def __call__(self, cond):
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, 1, -1)
        output_dim = self.action_dim * (2 if self.fixed_std is None else 1)
        out, _ = Transformer(
            output_dim=output_dim,
            horizon=self.horizon_steps,
            cond_dim=state.shape[-1],
            n_layer=self.transformer_num_layers,
            n_head=self.transformer_num_heads,
            n_emb=self.transformer_embed_dim,
            p_drop_emb=self.p_drop_emb,
            p_drop_attn=self.p_drop_attn,
            activation=self.transformer_activation,
            name="transformer",
        )(state)
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)
        mean = jnp.tanh(out[:, :, : self.action_dim]).reshape(
            B, self.horizon_steps * self.action_dim
        )
        if self.learn_fixed_std:
            logvar = self.param(
                "logvar",
                lambda rng: jnp.full(
                    (self.action_dim,), math.log(self.fixed_std**2)
                ),
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.tile(
                jnp.exp(0.5 * logvar)[None, :], (B, self.horizon_steps)
            )
        elif self.fixed_std is not None:
            scale = jnp.full_like(mean, self.fixed_std)
        else:
            logvar = out[:, :, self.action_dim :].reshape(
                B, self.horizon_steps * self.action_dim
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar)
        return mean, scale


class GMMTransformer(nn.Module):
    action_dim: int
    horizon_steps: int
    cond_dim: int
    num_modes: int = 5
    transformer_embed_dim: int = 256
    transformer_num_heads: int = 8
    transformer_num_layers: int = 6
    transformer_activation: str = "gelu"
    p_drop_emb: float = 0.0
    p_drop_attn: float = 0.0
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0

    @nn.compact
    def __call__(self, cond):
        B = cond["state"].shape[0]
        M = self.num_modes
        state = cond["state"].reshape(B, 1, -1)
        output_dim = self.action_dim * M
        if self.fixed_std is None:
            output_dim += M * self.action_dim
        out, prehead = Transformer(
            output_dim=output_dim,
            horizon=self.horizon_steps,
            cond_dim=state.shape[-1],
            n_layer=self.transformer_num_layers,
            n_head=self.transformer_num_heads,
            n_emb=self.transformer_embed_dim,
            p_drop_emb=self.p_drop_emb,
            p_drop_attn=self.p_drop_attn,
            activation=self.transformer_activation,
            name="transformer",
        )(state)
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)
        mean = jnp.tanh(out[:, :, : M * self.action_dim])
        mean = mean.reshape(B, self.horizon_steps, M, self.action_dim)
        mean = jnp.transpose(mean, (0, 2, 1, 3)).reshape(
            B, M, self.horizon_steps * self.action_dim
        )
        if self.learn_fixed_std:
            logvar = self.param(
                "logvar",
                lambda rng: jnp.full(
                    (M * self.action_dim,), math.log(self.fixed_std**2)
                ),
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar).reshape(1, M, self.action_dim)
            scale = jnp.tile(scale, (B, 1, self.horizon_steps))
        elif self.fixed_std is not None:
            scale = jnp.full_like(mean, self.fixed_std)
        else:
            logvar = out[:, :, M * self.action_dim :]
            logvar = logvar.reshape(B, self.horizon_steps, M, self.action_dim)
            logvar = jnp.transpose(logvar, (0, 2, 1, 3)).reshape(
                B, M, self.horizon_steps * self.action_dim
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar)
        weights = nn.Dense(M, kernel_init=normal02, name="modes_head")(
            prehead.reshape(B, -1)
        )
        return mean, scale, weights
