"""Gaussian policy MLP heads (flax.linen).

Parity with `model/common/mlp_gaussian.py`: Gaussian_MLP:278 — tanh-squashed
mean, std parameterized as (a) learned per-(chunk,dim) head with tanh-bounded
logvar, (b) fixed scalar, or (c) learnable per-action-dim logvar initialised
at fixed_std; Gaussian_VisionMLP:112 — ViT + SpatialEmb variant.

Returns (mean, scale) with shape (B, Ta*Da) each.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import MLP, ResidualMLP
from dppo_tpu.nets.modules import SpatialEmb, random_shift_aug


class GaussianMLP(nn.Module):
    action_dim: int
    horizon_steps: int
    cond_dim: int
    mlp_dims: Sequence[int] = (256, 256, 256)
    activation_type: str = "Mish"
    tanh_output: bool = True
    residual_style: bool = False
    use_layernorm: bool = False
    dropout: float = 0.0
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0

    @nn.compact
    def __call__(self, cond, *, deterministic: bool = True):
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        output_dim = self.action_dim * self.horizon_steps
        model = ResidualMLP if self.residual_style else MLP
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)

        if self.fixed_std is None:
            base = model(
                [self.cond_dim] + list(self.mlp_dims),
                activation_type=self.activation_type,
                out_activation_type=self.activation_type,
                use_layernorm=self.use_layernorm,
                use_layernorm_final=self.use_layernorm,
            )(state)
            mean = MLP(
                [self.mlp_dims[-1], output_dim], out_activation_type="Identity"
            )(base)
            logvar = MLP(
                [self.mlp_dims[-1], output_dim], out_activation_type="Identity"
            )(base)
            logvar = jnp.tanh(logvar)
            logvar = logvar_min + 0.5 * (logvar_max - logvar_min) * (logvar + 1)
            scale = jnp.exp(0.5 * logvar)
        else:
            mean = model(
                [self.cond_dim] + list(self.mlp_dims) + [output_dim],
                activation_type=self.activation_type,
                out_activation_type="Identity",
                use_layernorm=self.use_layernorm,
            )(state)
            if self.learn_fixed_std:
                logvar = self.param(
                    "logvar",
                    lambda rng: jnp.full(
                        (self.action_dim,),
                        math.log(self.fixed_std**2),
                        dtype=jnp.float32,
                    ),
                )
                logvar = jnp.clip(logvar, logvar_min, logvar_max)
                scale = jnp.exp(0.5 * logvar)
                scale = jnp.tile(scale[None, :], (B, self.horizon_steps))
            else:
                scale = jnp.full((B, output_dim), self.fixed_std)

        if self.tanh_output:
            mean = jnp.tanh(mean)
        return mean.reshape(B, output_dim), jnp.broadcast_to(
            scale, (B, output_dim)
        )


class GaussianVisionMLP(nn.Module):
    """ViT + proprio Gaussian head (`mlp_gaussian.py:112`)."""

    backbone: nn.Module
    action_dim: int
    horizon_steps: int
    cond_dim: int
    img_cond_steps: int = 1
    mlp_dims: Sequence[int] = (256, 256, 256)
    activation_type: str = "Mish"
    tanh_output: bool = True
    residual_style: bool = False
    use_layernorm: bool = False
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0
    spatial_emb: int = 0
    visual_feature_dim: int = 128
    dropout: float = 0.0
    num_img: int = 1
    augment: bool = False

    @nn.compact
    def __call__(self, cond, *, aug_rng=None, no_augment: bool = False):
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        rgb = cond["rgb"][:, -self.img_cond_steps :]
        _, T_rgb, C, H, W = rgb.shape
        if self.num_img > 1:
            rgb = rgb.reshape(B, T_rgb, self.num_img, 3, H, W)
            rgb = jnp.moveaxis(rgb, 2, 1).reshape(B, self.num_img, T_rgb * 3, H, W)
        else:
            rgb = rgb.reshape(B, T_rgb * C, H, W)
        rgb = rgb.astype(jnp.float32)
        do_aug = self.augment and aug_rng is not None and not no_augment

        def encode(img, name):
            feat = self.backbone(img)
            if self.spatial_emb > 0:
                return SpatialEmb(
                    num_patch=self.backbone.num_patch,
                    patch_dim=self.backbone.patch_repr_dim,
                    prop_dim=self.cond_dim,
                    proj_dim=self.spatial_emb,
                    dropout=self.dropout,
                    name=name,
                )(feat, state)
            feat = feat.reshape(B, -1)
            feat = nn.Dense(self.visual_feature_dim)(feat)
            feat = nn.LayerNorm()(feat)
            return nn.relu(feat)

        if self.num_img > 1:
            imgs = [rgb[:, 0], rgb[:, 1]]
            if do_aug:
                import jax

                rngs = jax.random.split(aug_rng, 2)
                imgs = [random_shift_aug(r, im) for r, im in zip(rngs, imgs)]
            feat = jnp.concatenate(
                [encode(im, f"compress{i+1}") for i, im in enumerate(imgs)],
                axis=-1,
            )
        else:
            if do_aug:
                rgb = random_shift_aug(aug_rng, rgb)
            feat = encode(rgb, "compress")
        x = jnp.concatenate([feat, state], axis=-1)

        output_dim = self.action_dim * self.horizon_steps
        model = ResidualMLP if self.residual_style else MLP
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)
        mean = model(
            [x.shape[-1]] + list(self.mlp_dims) + [output_dim],
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
        )(x)
        if self.learn_fixed_std:
            logvar = self.param(
                "logvar",
                lambda rng: jnp.full(
                    (self.action_dim,),
                    math.log(self.fixed_std**2),
                    dtype=jnp.float32,
                ),
            )
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.tile(jnp.exp(0.5 * logvar)[None, :], (B, self.horizon_steps))
        elif self.fixed_std is not None:
            scale = jnp.full((B, output_dim), self.fixed_std)
        else:
            # reference vision head (mlp_gaussian.py:189-194, 269-274): the
            # logvar head is a plain MLP with ONE hidden layer
            # (mlp_dims[-1:]), and the logvar is CLAMPED to range — unlike
            # the state head's tanh-range mapping (oracle-pinned,
            # tests/test_reference_parity_vision2.py)
            logvar = MLP(
                [x.shape[-1]] + list(self.mlp_dims[-1:]) + [output_dim],
                activation_type=self.activation_type,
                out_activation_type="Identity",
                use_layernorm=self.use_layernorm,
            )(x)
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar)
        if self.tanh_output:
            mean = jnp.tanh(mean)
        return mean, jnp.broadcast_to(scale, (B, output_dim))


class GaussianPointMLP(nn.Module):
    """Point-cloud encoder + proprio Gaussian head (fork-added,
    `mlp_gaussian.py:15` Gaussian_PointMLP)."""

    backbone: nn.Module
    action_dim: int
    horizon_steps: int
    cond_dim: int
    spatial_emb: int = 0
    pnt_cond_steps: int = 1
    mlp_dims: Sequence[int] = (256, 256, 256)
    activation_type: str = "Mish"
    residual_style: bool = False
    use_layernorm: bool = False
    fixed_std: Optional[float] = None
    learn_fixed_std: bool = False
    std_min: float = 0.01
    std_max: float = 1.0

    @nn.compact
    def __call__(self, cond, *, aug_rng=None, **kwargs):
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        pnt = cond["point"][:, -self.pnt_cond_steps :]
        feat = self.backbone(pnt, aug_rng=aug_rng)
        x = jnp.concatenate([feat, state], axis=-1)
        output_dim = self.action_dim * self.horizon_steps
        model = ResidualMLP if self.residual_style else MLP
        logvar_min = math.log(self.std_min**2)
        logvar_max = math.log(self.std_max**2)
        mean = model(
            [x.shape[-1]] + list(self.mlp_dims) + [output_dim],
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
        )(x)
        mean = jnp.tanh(mean)
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
            logvar = MLP(
                [x.shape[-1]] + list(self.mlp_dims[-1:]) + [output_dim],
                activation_type=self.activation_type,
                out_activation_type="Identity",
                use_layernorm=self.use_layernorm,
            )(x)
            logvar = jnp.clip(logvar, logvar_min, logvar_max)
            scale = jnp.exp(0.5 * logvar)
        return mean, jnp.broadcast_to(scale, (B, output_dim))
