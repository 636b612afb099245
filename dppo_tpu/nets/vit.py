"""Minimal ViT image encoder (flax.linen).

Parity with `model/common/vit.py` (IBRL MinVit): PatchEmbed1/2 (:64,:78),
multi-head attention (:103 — the reference forces torch flash/mem-efficient
SDPA; on TPU, XLA fuses `jax.nn.dot_product_attention` natively at these
sizes, ≤121 tokens), pre-LN transformer layers (:128), learned position
embedding, final LayerNorm, pixel /255−0.5 normalization (:57).

Input layout (B, C, H, W) to match the reference call sites; converted to
channels-last internally for TPU-friendly convolutions.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class PatchEmbed1(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, N, D)
        y = nn.Conv(
            self.embed_dim, kernel_size=(8, 8), strides=(8, 8),
            padding="VALID", kernel_init=trunc02,
        )(x)
        B, H, W, D = y.shape
        return y.reshape(B, H * W, D)


class PatchEmbed2(nn.Module):
    embed_dim: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.embed_dim, kernel_size=(8, 8), strides=(4, 4),
            padding="VALID", kernel_init=trunc02,
        )(x)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=None, group_size=1)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.embed_dim, kernel_size=(3, 3), strides=(2, 2),
            padding="VALID", kernel_init=trunc02,
        )(y)
        B, H, W, D = y.shape
        return y.reshape(B, H * W, D)


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_head: int

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        qkv = nn.Dense(3 * self.embed_dim, kernel_init=trunc02)(x)
        qkv = qkv.reshape(B, T, 3, self.num_head, D // self.num_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(B, T, D)
        return nn.Dense(self.embed_dim, kernel_init=trunc02)(attn)


class TransformerLayer(nn.Module):
    embed_dim: int
    num_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(
            MultiHeadAttention(self.embed_dim, self.num_head)(h)
        )
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(4 * self.embed_dim, kernel_init=trunc02)(h)
        # exact (erf) gelu: torch F.gelu's default, used by the reference
        # (vit.py:148); jax defaults to the tanh approximation
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, kernel_init=trunc02)(h)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(h)


def _patch2_num(img_h, img_w):
    H1 = math.ceil((img_h - 8) / 4) + 1
    W1 = math.ceil((img_w - 8) / 4) + 1
    H2 = math.ceil((H1 - 3) / 2) + 1
    W2 = math.ceil((W1 - 3) / 2) + 1
    return H2 * W2


def VitEncoder(obs_shape=None, cfg=None, num_channel=3, img_h=96, img_w=96,
               **kwargs):
    """Factory matching the reference constructor (`vit.py:27-52`), which
    takes a nested `cfg` (VitEncoderConfig) — flattened into MinVitEncoder
    fields here."""
    fields = dict(cfg or {})
    fields.update(kwargs)
    fields.pop("act_layer", None)
    fields.pop("stride", None)
    return MinVitEncoder(
        obs_shape=tuple(obs_shape) if obs_shape else None,
        num_channel=num_channel,
        img_h=img_h,
        img_w=img_w,
        **fields,
    )


class MinVitEncoder(nn.Module):
    """obs (B, C, H, W) uint8/float in [0,255] -> patch features (B, N, D)."""

    obs_shape: Optional[Sequence[int]] = None
    patch_size: int = 8
    depth: int = 1
    embed_dim: int = 128
    num_heads: int = 4
    embed_style: str = "embed2"
    embed_norm: int = 0
    num_channel: int = 3
    img_h: int = 96
    img_w: int = 96

    @property
    def num_patch(self) -> int:
        if self.embed_style == "embed1":
            return math.ceil(self.img_h / 8) * math.ceil(self.img_w / 8)
        return _patch2_num(self.img_h, self.img_w)

    @property
    def patch_repr_dim(self) -> int:
        return self.embed_dim

    @property
    def repr_dim(self) -> int:
        return self.embed_dim * self.num_patch

    @nn.compact
    def __call__(self, obs, flatten: bool = False):
        x = obs / 255.0 - 0.5
        x = jnp.transpose(x, (0, 2, 3, 1))  # channels-last for TPU convs
        if self.embed_style == "embed1":
            x = PatchEmbed1(self.embed_dim)(x)
        elif self.embed_style == "embed2":
            x = PatchEmbed2(self.embed_dim, use_norm=bool(self.embed_norm))(x)
        else:
            raise ValueError(self.embed_style)
        pos = self.param(
            "pos_embed", trunc02, (1, x.shape[1], self.embed_dim)
        )
        x = x + pos
        for _ in range(self.depth):
            x = TransformerLayer(self.embed_dim, self.num_heads)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        if flatten:
            x = x.reshape(x.shape[0], -1)
        return x
