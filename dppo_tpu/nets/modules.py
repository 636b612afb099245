"""Small shared modules: sinusoidal time embedding, 1-D conv blocks, spatial
embedding, random-shift augmentation.

Parity targets: `model/diffusion/modules.py` (SinusoidalPosEmb:14,
Downsample1d:30, Upsample1d:40, Conv1dBlock:50) and `model/common/modules.py`
(SpatialEmb:10, RandomShiftsAug:44).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import ACTIVATIONS


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """t: (B,) float or int → (B, dim). Matches modules.py:14-27."""
    half_dim = dim // 2
    emb_scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(-emb_scale * jnp.arange(half_dim, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """SinusoidalPosEmb -> Dense(2d) -> Mish -> Dense(d), as used by every
    denoiser head (`mlp_diffusion.py:83-88`, `unet.py`)."""

    time_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = sinusoidal_pos_emb(t, self.time_dim)
        emb = nn.Dense(self.time_dim * 2, dtype=self.dtype)(emb)
        emb = ACTIVATIONS["Mish"](emb)
        return nn.Dense(self.time_dim, dtype=self.dtype)(emb)


class Conv1dBlock(nn.Module):
    """Conv1d → GroupNorm → Mish over the action-chunk time axis.

    Input layout (B, T, C) — channels-last, the native layout for XLA:TPU
    convolutions (the reference uses torch's (B, C, T), modules.py:50-64).
    """

    out_channels: int
    kernel_size: int
    n_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            padding=self.kernel_size // 2,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=self.n_groups)(x)
        return ACTIVATIONS["Mish"](x)


class Downsample1d(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C) -> (B, T//2, C)
        return nn.Conv(self.dim, kernel_size=(3,), strides=(2,), padding=1, dtype=self.dtype)(x)


class Upsample1d(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C) -> (B, 2T, C)
        return nn.ConvTranspose(
            self.dim, kernel_size=(4,), strides=(2,), padding="SAME", dtype=self.dtype
        )(x)


class SpatialEmb(nn.Module):
    """Learned spatial pooling of ViT patch features fused with proprio.

    Parity with `model/common/modules.py:10-42`: per-patch features are
    projected per *feature column* — input (B, num_patch, patch_dim) is
    transposed to (B, patch_dim, num_patch), concatenated with proprio, run
    through ONE Linear -> LayerNorm -> ReLU block to proj_dim, then reduced
    by a learned per-(column, proj) weight `(1, patch_dim, proj_dim)`
    summed over the column axis. (An earlier revision used a second
    projection block and a rank-reduced (1, patch_dim, 1) weight — caught
    by reading against the oracle and fixed; pinned in
    tests/test_reference_parity_vision.py.)
    """

    num_patch: int
    patch_dim: int
    prop_dim: int
    proj_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, prop, *, deterministic: bool = True):
        # feat: (B, num_patch, patch_dim) -> (B, patch_dim, num_patch)
        feat = jnp.swapaxes(feat, 1, 2)
        if self.prop_dim > 0 and prop is not None:
            repeated = jnp.repeat(prop[:, None, :], feat.shape[1], axis=1)
            feat = jnp.concatenate([feat, repeated], axis=-1)
        y = nn.Dense(self.proj_dim, dtype=self.dtype)(feat)
        # torch nn.LayerNorm default eps (reference modules.py:21)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (1, self.patch_dim, self.proj_dim),
        )
        z = (y * weight).sum(axis=1)
        z = nn.Dropout(self.dropout, deterministic=deterministic)(z)
        return z


def random_shift_aug(rng: jax.Array, imgs: jnp.ndarray, pad: int = 4) -> jnp.ndarray:
    """DrQ-style random shift augmentation (parity: modules.py:44-71).

    imgs: (B, C, H, W) float. Pads by `pad` with edge replication and
    bilinearly resamples at a per-image uniformly-shifted grid.
    """
    b, c, h, w = imgs.shape
    padded = jnp.pad(
        imgs, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge"
    )
    # integer pixel shift in [0, 2*pad], same for x/y per image
    shift = jax.random.uniform(rng, (b, 2), minval=0.0, maxval=2 * pad + 1.0)
    shift = jnp.floor(shift)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def sample_one(img, sh):
        # img: (C, H+2p, W+2p); sh: (2,) — (x, y) shift
        yy = ys + sh[1]
        xx = xs + sh[0]
        out = img[:, yy.astype(jnp.int32)][:, :, xx.astype(jnp.int32)]
        return out

    return jax.vmap(sample_one)(padded, shift)
