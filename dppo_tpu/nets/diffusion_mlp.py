"""MLP denoiser heads for diffusion policies (flax.linen).

Parity targets in `model/diffusion/mlp_diffusion.py`:
  - DiffusionMLP:174 — state-conditioned denoiser: sinusoidal time embedding
    → MLP over [flattened action chunk, time emb, state(, cond-MLP encoded)].
  - VisionDiffusionMLP:19 — ViT backbone + SpatialEmb/linear compress fused
    with proprio, optional random-shift augmentation.

Call convention (pure): net.apply(params, x, t, cond) with
  x: (B, Ta, Da), t: (B,) int/float, cond: dict with "state": (B, To, Do)
  (and "rgb": (B, To, C, H, W) for the vision variant) → (B, Ta, Da).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import MLP, ResidualMLP
from dppo_tpu.nets.modules import TimeEmbedding, SpatialEmb, random_shift_aug


class DiffusionMLP(nn.Module):
    action_dim: int
    horizon_steps: int
    cond_dim: int
    time_dim: int = 16
    mlp_dims: Sequence[int] = (256, 256)
    cond_mlp_dims: Optional[Sequence[int]] = None
    activation_type: str = "Mish"
    out_activation_type: str = "Identity"
    use_layernorm: bool = False
    residual_style: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond):
        B = x.shape[0]
        Ta, Da = self.horizon_steps, self.action_dim
        x_flat = x.reshape(B, -1)
        state = cond["state"].reshape(B, -1)
        if self.cond_mlp_dims is not None:
            state = MLP(
                [self.cond_dim] + list(self.cond_mlp_dims),
                activation_type=self.activation_type,
                out_activation_type="Identity",
                dtype=self.dtype,
            )(state)
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        time_emb = TimeEmbedding(self.time_dim, dtype=self.dtype)(t)
        feat = jnp.concatenate([x_flat, time_emb, state], axis=-1)
        model = ResidualMLP if self.residual_style else MLP
        out = model(
            [feat.shape[-1]] + list(self.mlp_dims) + [Ta * Da],
            activation_type=self.activation_type,
            out_activation_type=self.out_activation_type,
            use_layernorm=self.use_layernorm,
            dtype=self.dtype,
        )(feat)
        return out.reshape(B, Ta, Da)


class VisionDiffusionMLP(nn.Module):
    """ViT-encoded pixels + proprio conditioned denoiser (`mlp_diffusion.py:19`).

    TPU-native cond-hoist: the ViT + SpatialEmb encoder depends only on
    `cond`, which is loop-invariant across the K-step denoising scan, so
    samplers encode ONCE (`return_cond_feat=True`) and replay the feature
    into every step (`cond_feat=...`), skipping the encoder — at the 96x96
    reference operating point the encoder is ~20x the trunk FLOPs, so this
    multiplies pixel sampling throughput by ~encoder_share*K. Numerically
    identical (same ops on the same inputs; in-net augmentation is never
    active on these paths — agents augment at buffer level)."""

    supports_cond_feat = True

    backbone: nn.Module
    action_dim: int
    horizon_steps: int
    cond_dim: int
    img_cond_steps: int = 1
    time_dim: int = 16
    mlp_dims: Sequence[int] = (256, 256)
    activation_type: str = "Mish"
    out_activation_type: str = "Identity"
    use_layernorm: bool = False
    residual_style: bool = False
    spatial_emb: int = 0
    visual_feature_dim: int = 128
    dropout: float = 0.0
    num_img: int = 1
    augment: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        t,
        cond,
        *,
        aug_rng=None,
        no_augment: bool = False,
        cond_feat=None,
        return_cond_feat: bool = False,
    ):
        B = x.shape[0]
        Ta, Da = self.horizon_steps, self.action_dim
        x_flat = x.reshape(B, -1)
        state = cond["state"].reshape(B, -1)
        if cond_feat is not None:
            feat = cond_feat
            return self._trunk(
                x_flat, t, feat, state, B, Ta, Da, return_cond_feat
            )
        rgb = cond["rgb"][:, -self.img_cond_steps :]
        _, T_rgb, C, H, W = rgb.shape

        if self.num_img > 1:
            rgb = rgb.reshape(B, T_rgb, self.num_img, 3, H, W)
            rgb = jnp.moveaxis(rgb, 2, 1).reshape(B, self.num_img, T_rgb * 3, H, W)
        else:
            rgb = rgb.reshape(B, T_rgb * C, H, W)
        rgb = rgb.astype(jnp.float32)

        do_aug = self.augment and aug_rng is not None and not no_augment

        def encode(img, spatial_name):
            feat = self.backbone(img)
            if self.spatial_emb > 0:
                return SpatialEmb(
                    num_patch=self.backbone.num_patch,
                    patch_dim=self.backbone.patch_repr_dim,
                    prop_dim=self.cond_dim,
                    proj_dim=self.spatial_emb,
                    dropout=self.dropout,
                    name=spatial_name,
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
                [encode(im, f"compress{i+1}") for i, im in enumerate(imgs)], axis=-1
            )
        else:
            if do_aug:
                rgb = random_shift_aug(aug_rng, rgb)
            feat = encode(rgb, "compress")

        return self._trunk(x_flat, t, feat, state, B, Ta, Da, return_cond_feat)

    def _trunk(self, x_flat, t, feat, state, B, Ta, Da, return_cond_feat):
        cond_encoded = jnp.concatenate([feat, state], axis=-1)
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        time_emb = TimeEmbedding(self.time_dim)(t)
        h = jnp.concatenate([x_flat, time_emb, cond_encoded], axis=-1)
        model = ResidualMLP if self.residual_style else MLP
        out = model(
            [h.shape[-1]] + list(self.mlp_dims) + [Ta * Da],
            activation_type=self.activation_type,
            out_activation_type=self.out_activation_type,
            use_layernorm=self.use_layernorm,
        )(h)
        out = out.reshape(B, Ta, Da)
        if return_cond_feat:
            return out, feat
        return out
