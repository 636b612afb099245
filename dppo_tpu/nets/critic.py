"""Critic networks (flax.linen).

Parity targets in `model/common/critic.py`: CriticObs:15 (V(s) MLP),
CriticObsAct:57 (double Q(s,a)), ViTCritic:116 (ViT + SpatialEmb V(s)),
PointCritic:209 (point-encoder V(s)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import MLP, ResidualMLP
from dppo_tpu.nets.modules import SpatialEmb, random_shift_aug


def _flatten_cond(cond):
    if isinstance(cond, dict):
        state = cond["state"]
        return state.reshape(state.shape[0], -1)
    return cond


class CriticObs(nn.Module):
    cond_dim: int
    mlp_dims: Sequence[int]
    activation_type: str = "Mish"
    use_layernorm: bool = False
    residual_style: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        state = _flatten_cond(cond)
        model = ResidualMLP if self.residual_style else MLP
        return model(
            [state.shape[-1]] + list(self.mlp_dims) + [1],
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
            dtype=self.dtype,
        )(state)


class CriticObsAct(nn.Module):
    """Double Q(s, a) over flattened obs history and action chunk."""

    cond_dim: int
    mlp_dims: Sequence[int]
    action_dim: int
    action_steps: int = 1
    activation_type: str = "Mish"
    use_layernorm: bool = False
    residual_style: bool = False
    double_q: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond, action):
        state = _flatten_cond(cond)
        B = state.shape[0]
        x = jnp.concatenate([state, action.reshape(B, -1)], axis=-1)
        model = ResidualMLP if self.residual_style else MLP
        dims = [x.shape[-1]] + list(self.mlp_dims) + [1]
        kw = dict(
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
            dtype=self.dtype,
        )
        q1 = model(dims, **kw)(x)[..., 0]
        if self.double_q:
            q2 = model(dims, **kw)(x)[..., 0]
            return q1, q2
        return q1


class ViTCritic(nn.Module):
    """ViT-encoded pixels + proprio V(s) (`critic.py:116-206`)."""

    backbone: nn.Module
    cond_dim: int
    mlp_dims: Sequence[int]
    img_cond_steps: int = 1
    spatial_emb: int = 128
    activation_type: str = "Mish"
    use_layernorm: bool = False
    residual_style: bool = False
    dropout: float = 0.0
    augment: bool = False
    num_img: int = 1

    @nn.compact
    def __call__(self, cond, *, aug_rng=None, no_augment: bool = False):
        state = cond["state"]
        B = state.shape[0]
        state = state.reshape(B, -1)
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
            return SpatialEmb(
                num_patch=self.backbone.num_patch,
                patch_dim=self.backbone.patch_repr_dim,
                prop_dim=self.cond_dim,
                proj_dim=self.spatial_emb,
                dropout=self.dropout,
                name=name,
            )(feat, state)

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
        feat = jnp.concatenate([feat, state], axis=-1)
        model = ResidualMLP if self.residual_style else MLP
        return model(
            [feat.shape[-1]] + list(self.mlp_dims) + [1],
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
        )(feat)


class PointCritic(nn.Module):
    """Point-cloud encoder + proprio V(s) (fork-added, `critic.py:209-236`).

    `backbone` matches the reference constructor arg name (critic.py:214);
    cond["point"] is (B, To, F, L, D) and the last `pnt_cond_steps` history
    entries feed the encoder as its (b, t, f, l, d) input (the encoder's
    n_step must equal pnt_cond_steps)."""

    backbone: nn.Module
    cond_dim: int
    mlp_dims: Sequence[int]
    pnt_cond_steps: int = 1
    activation_type: str = "Mish"
    use_layernorm: bool = False
    residual_style: bool = False

    @nn.compact
    def __call__(self, cond, **kwargs):
        state = cond["state"]
        B = state.shape[0]
        state = state.reshape(B, -1)
        point = cond["point"]
        point = point.reshape((B,) + point.shape[-4:])  # (B, To, F, L, D)
        feat = self.backbone(point[:, -self.pnt_cond_steps :])
        feat = jnp.concatenate([feat, state], axis=-1)
        model = ResidualMLP if self.residual_style else MLP
        return model(
            [feat.shape[-1]] + list(self.mlp_dims) + [1],
            activation_type=self.activation_type,
            out_activation_type="Identity",
            use_layernorm=self.use_layernorm,
        )(feat)
