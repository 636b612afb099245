"""Conv1d U-Net denoisers over the action-chunk time axis (flax.linen).

Parity with `model/diffusion/unet.py`: ResidualBlock1D:27 (two Conv1d-
GroupNorm-Mish blocks with FiLM conditioning — per-channel scale/bias
predicted from [time-emb, state]), Unet1D:121 (down path / two mid blocks /
up path with skip concatenation, final conv head), VisionUnet1D:330
(ViT backbone + SpatialEmb/linear compress), PointUnet1D:621 (point-cloud
encoder backbone).

Layout: channels-last (B, Ta, C) internally — the native layout for XLA:TPU
convolutions (the reference uses torch (B, C, Ta)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import ACTIVATIONS, ResidualMLP
from dppo_tpu.nets.modules import SpatialEmb, TimeEmbedding, random_shift_aug
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP  # noqa: F401 (re-export site)


class Conv1dBlock(nn.Module):
    out_channels: int
    kernel_size: int
    n_groups: Optional[int] = None
    activation_type: str = "Mish"
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            padding=self.kernel_size // 2,
        )(x)
        if self.n_groups is not None:
            x = nn.GroupNorm(num_groups=self.n_groups, epsilon=self.eps)(x)
        return ACTIVATIONS[self.activation_type](x)


class ResidualBlock1D(nn.Module):
    out_channels: int
    cond_dim: int
    kernel_size: int = 5
    n_groups: Optional[int] = None
    cond_predict_scale: bool = False
    larger_encoder: bool = False
    activation_type: str = "Mish"
    groupnorm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, cond):
        """x: (B, T, C_in); cond: (B, cond_dim) -> (B, T, C_out)."""
        act = ACTIVATIONS[self.activation_type]
        out = Conv1dBlock(
            self.out_channels, self.kernel_size, self.n_groups,
            self.activation_type, self.groupnorm_eps,
        )(x)
        cond_channels = (
            self.out_channels * 2 if self.cond_predict_scale else self.out_channels
        )
        if self.larger_encoder:
            e = nn.Dense(cond_channels)(cond)
            e = act(e)
            e = nn.Dense(cond_channels)(e)
            e = act(e)
            e = nn.Dense(cond_channels)(e)
        else:
            e = nn.Dense(cond_channels)(act(cond))
        if self.cond_predict_scale:
            scale, bias = jnp.split(e, 2, axis=-1)
            out = scale[:, None, :] * out + bias[:, None, :]
        else:
            out = out + e[:, None, :]
        out = Conv1dBlock(
            self.out_channels, self.kernel_size, self.n_groups,
            self.activation_type, self.groupnorm_eps,
        )(out)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, kernel_size=(1,))(x)
        return out + x


class Unet1D(nn.Module):
    action_dim: int
    cond_dim: Optional[int] = None
    diffusion_step_embed_dim: int = 32
    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    smaller_encoder: bool = False
    cond_mlp_dims: Optional[Sequence[int]] = None
    kernel_size: int = 5
    n_groups: Optional[int] = None
    activation_type: str = "Mish"
    cond_predict_scale: bool = False
    groupnorm_eps: float = 1e-5

    def _encode_cond(self, t, state):
        dsed = self.diffusion_step_embed_dim
        # time MLP: sinusoidal -> Dense(4*dsed) -> Mish -> Dense(dsed)
        from dppo_tpu.nets.modules import sinusoidal_pos_emb

        emb = sinusoidal_pos_emb(t, dsed)
        emb = nn.Dense(dsed * 4, name="time_mlp_1")(emb)
        emb = ACTIVATIONS["Mish"](emb)
        emb = nn.Dense(dsed, name="time_mlp_2")(emb)
        if self.cond_mlp_dims is not None:
            state = ResidualMLP(
                [self.cond_dim] + list(self.cond_mlp_dims),
                activation_type=self.activation_type,
                out_activation_type="Identity",
                name="cond_mlp",
            )(state)
        return jnp.concatenate([emb, state], axis=-1)

    @nn.compact
    def __call__(self, x, t, cond):
        """x: (B, Ta, Da); t: (B,); cond {"state": (B, To, Do)} -> (B, Ta, Da)."""
        B, Ta, Da = x.shape
        state = cond["state"].reshape(B, -1)
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        global_feature = self._encode_cond(t, state)

        use_large = self.cond_mlp_dims is None and not self.smaller_encoder
        dims = [self.action_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        block = lambda c_out, name: ResidualBlock1D(
            out_channels=c_out,
            cond_dim=global_feature.shape[-1],
            kernel_size=self.kernel_size,
            n_groups=self.n_groups,
            cond_predict_scale=self.cond_predict_scale,
            larger_encoder=use_large,
            activation_type=self.activation_type,
            groupnorm_eps=self.groupnorm_eps,
            name=name,
        )

        h = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = block(dim_out, f"down{ind}_res1")(x, global_feature)
            x = block(dim_out, f"down{ind}_res2")(x, global_feature)
            h.append(x)
            if not is_last:
                x = nn.Conv(
                    dim_out, kernel_size=(3,), strides=(2,), padding=1,
                    name=f"down{ind}_ds",
                )(x)

        mid_dim = dims[-1]
        x = block(mid_dim, "mid_res1")(x, global_feature)
        x = block(mid_dim, "mid_res2")(x, global_feature)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= len(in_out) - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block(dim_in, f"up{ind}_res1")(x, global_feature)
            x = block(dim_in, f"up{ind}_res2")(x, global_feature)
            if not is_last:
                x = nn.ConvTranspose(
                    dim_in, kernel_size=(4,), strides=(2,), padding="SAME",
                    name=f"up{ind}_us",
                )(x)

        x = Conv1dBlock(
            self.dim, self.kernel_size, self.n_groups, self.activation_type,
            self.groupnorm_eps,
        )(x)
        x = nn.Conv(self.action_dim, kernel_size=(1,), name="final_conv")(x)
        return x


class VisionUnet1D(nn.Module):
    """ViT-encoded pixels feeding the U-Net condition (`unet.py:330`).

    Supports the TPU-native cond-hoist (see VisionDiffusionMLP): samplers
    encode the loop-invariant pixel condition once per chain and replay the
    feature into every denoise step via `cond_feat`."""

    supports_cond_feat = True

    backbone: nn.Module
    action_dim: int
    img_cond_steps: int = 1
    cond_dim: Optional[int] = None
    diffusion_step_embed_dim: int = 32
    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    smaller_encoder: bool = False
    cond_mlp_dims: Optional[Sequence[int]] = None
    kernel_size: int = 5
    n_groups: Optional[int] = None
    activation_type: str = "Mish"
    cond_predict_scale: bool = False
    groupnorm_eps: float = 1e-5
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
        state = cond["state"].reshape(B, -1)
        if cond_feat is not None:
            feat = cond_feat
        else:
            rgb = cond["rgb"][:, -self.img_cond_steps :]
            _, T_rgb, C, H, W = rgb.shape
            rgb = rgb.reshape(B, T_rgb * C, H, W).astype(jnp.float32)
            if self.augment and aug_rng is not None and not no_augment:
                rgb = random_shift_aug(aug_rng, rgb)
            feat = self.backbone(rgb)
            if self.spatial_emb > 0:
                feat = SpatialEmb(
                    num_patch=self.backbone.num_patch,
                    patch_dim=self.backbone.patch_repr_dim,
                    prop_dim=self.cond_dim,
                    proj_dim=self.spatial_emb,
                    dropout=self.dropout,
                    name="compress",
                )(feat, state)
            else:
                feat = feat.reshape(B, -1)
                feat = nn.Dense(self.visual_feature_dim)(feat)
                feat = nn.LayerNorm()(feat)
                feat = nn.relu(feat)
        full_state = jnp.concatenate([feat, state], axis=-1)
        inner = Unet1D(
            action_dim=self.action_dim,
            cond_dim=full_state.shape[-1],
            diffusion_step_embed_dim=self.diffusion_step_embed_dim,
            dim=self.dim,
            dim_mults=self.dim_mults,
            smaller_encoder=self.smaller_encoder,
            cond_mlp_dims=self.cond_mlp_dims,
            kernel_size=self.kernel_size,
            n_groups=self.n_groups,
            activation_type=self.activation_type,
            cond_predict_scale=self.cond_predict_scale,
            groupnorm_eps=self.groupnorm_eps,
            name="unet",
        )
        out = inner(x, t, {"state": full_state[:, None, :]})
        if return_cond_feat:
            return out, feat
        return out


class PointUnet1D(nn.Module):
    """Point-cloud encoder feeding the U-Net condition (fork-added,
    `unet.py:621`; `backbone` matches the reference constructor arg name).
    cond["point"] is (B, To, F, L, D), fed whole to the encoder (whose
    n_step must equal the obs-history length To)."""

    backbone: nn.Module
    action_dim: int
    cond_dim: Optional[int] = None
    diffusion_step_embed_dim: int = 32
    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    smaller_encoder: bool = False
    cond_mlp_dims: Optional[Sequence[int]] = None
    kernel_size: int = 5
    n_groups: Optional[int] = None
    activation_type: str = "Mish"
    cond_predict_scale: bool = False
    groupnorm_eps: float = 1e-5

    supports_cond_feat = True

    @nn.compact
    def __call__(
        self, x, t, cond, *, aug_rng=None, cond_feat=None,
        return_cond_feat=False, **kwargs,
    ):
        B = x.shape[0]
        state = cond["state"].reshape(B, -1)
        if cond_feat is not None:
            feat = cond_feat
        else:
            point = cond["point"]
            point = point.reshape((B,) + point.shape[-4:])  # (B, To, F, L, D)
            feat = self.backbone(point, aug_rng=aug_rng)
        full_state = jnp.concatenate([feat, state], axis=-1)
        inner = Unet1D(
            action_dim=self.action_dim,
            cond_dim=full_state.shape[-1],
            diffusion_step_embed_dim=self.diffusion_step_embed_dim,
            dim=self.dim,
            dim_mults=self.dim_mults,
            smaller_encoder=self.smaller_encoder,
            cond_mlp_dims=self.cond_mlp_dims,
            kernel_size=self.kernel_size,
            n_groups=self.n_groups,
            activation_type=self.activation_type,
            cond_predict_scale=self.cond_predict_scale,
            groupnorm_eps=self.groupnorm_eps,
            name="unet",
        )
        out = inner(x, t, {"state": full_state[:, None, :]})
        if return_cond_feat:
            return out, feat
        return out

