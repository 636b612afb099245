"""Point-cloud encoders (flax.linen).

Parity with the fork-added `model/common/point_encoder.py`:
  - PointEncoder:8 — PointNet-style per-layer (Linear+ReLU → global max →
    concat global context → Linear+ReLU+Dropout), multi-scale concat,
    projection, final max-pool; per-frame weight sharing option.
  - PointEncoderSA:78 — set-abstraction attention: FPS query sampling + KNN
    grouping (JAX-native, `dppo_tpu/ops/fps_knn.py` — replaces the pytorch3d
    CUDA ops), per-group self-attention + feed-forward, max-pool, residual
    MLP upscale, projection.

TPU deviation (intentional): the reference truncates padded points to the
batch-min valid length (`process_point:188`) — a dynamic shape. Here padded
points are masked out of every max-pool / distance computation instead,
keeping shapes static for jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import ResidualMLP
from dppo_tpu.ops.fps_knn import farthest_point_sampling, knn_gather, valid_mask

_NEG = -1e9


def _masked_max(x, mask, axis):
    return jnp.max(jnp.where(mask, x, _NEG), axis=axis)


def _maybe_noise(pnt, rng, noise):
    if rng is None or noise <= 0:
        return pnt
    return pnt + jax.random.uniform(
        rng, pnt.shape, minval=-noise, maxval=noise
    )


class PointEncoder(nn.Module):
    in_dim: int = 3
    n_step: int = 1
    n_frame: int = 1
    augment_pnt: float = 0.01
    hidden_dim: Sequence[int] = (16, 32, 64, 128)
    embed_dim: int = 128
    dropout: float = 0.0
    share_frame: bool = True

    @nn.compact
    def __call__(self, pnt, *, aug_rng=None, deterministic: bool = True):
        """pnt: (B, T, F, L, D) -> (B, embed_dim)."""
        nb, nt, nf, nl, nd = pnt.shape
        assert nt == self.n_step and nf == self.n_frame
        assert self.embed_dim % (self.n_step * self.n_frame) == 0
        n_lyr_frame = 1 if self.share_frame else self.n_frame
        if self.share_frame:
            x_all = pnt.reshape(nb * nt * nf, nl, nd)
        else:
            x_all = pnt.reshape(nb * nt, nf, nl, nd)

        proj = nn.Dense(
            self.embed_dim // self.n_step // self.n_frame, name="proj_out"
        )
        fs = []
        for i in range(n_lyr_frame):
            x = x_all if self.share_frame else x_all[:, i]
            mask = valid_mask(x)[..., None]  # (b, L, 1)
            x = _maybe_noise(x, aug_rng, self.augment_pnt if aug_rng else 0.0)
            xs = []
            for li, h in enumerate(self.hidden_dim):
                x = nn.relu(nn.Dense(h, name=f"lyr{li}_f{i}")(x))
                gx = _masked_max(x, mask, axis=1)[:, None, :]
                gx = jnp.concatenate(
                    [x, jnp.broadcast_to(gx, x.shape)], axis=-1
                )
                x = nn.relu(nn.Dense(h, name=f"glyr{li}_f{i}")(gx))
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
                xs.append(x)
            x = proj(jnp.concatenate(xs, axis=-1))
            x = _masked_max(x, mask, axis=1)  # (b, d)
            if self.share_frame:
                x = x.reshape(nb, nt * nf * x.shape[-1])
            else:
                x = x.reshape(nb, nt * x.shape[-1])
            fs.append(x)
        return jnp.concatenate(fs, axis=-1)


class SelfAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.d_model
        )(h, h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class FefoAttention(nn.Module):
    d_model: int
    d_fefo: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(self.d_fefo)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class PointEncoderSA(nn.Module):
    in_dim: int = 3
    n_step: int = 1
    n_frame: int = 1
    augment_pnt: float = 0.01
    hidden_dim: Sequence[int] = (16, 32, 48)
    embed_dim: int = 64
    dropout: Tuple[float, float] = (0.0, 0.0)
    num_head: int = 4
    mul_que: float = 0.125
    mul_neb: float = 1.25
    share_frame: bool = True

    @nn.compact
    def __call__(self, pnt, *, aug_rng=None, sample_rng=None,
                 deterministic: bool = True):
        nb, nt, nf, nl, nd = pnt.shape
        assert nt == self.n_step and nf == self.n_frame
        num_neb = int(self.mul_neb / self.mul_que)
        n_lyr_frame = 1 if self.share_frame else self.n_frame
        if self.share_frame:
            x_all = pnt.reshape(nb * nt * nf, nl, nd)
        else:
            x_all = pnt.reshape(nb * nt, nf, nl, nd)
        if sample_rng is None:
            sample_rng = jax.random.key(0)

        proj_out = nn.Dense(
            self.embed_dim // self.n_step // self.n_frame, name="proj_out"
        )
        fs = []
        for i in range(n_lyr_frame):
            raw = x_all if self.share_frame else x_all[:, i]
            mask = valid_mask(raw)
            raw = _maybe_noise(raw, aug_rng, self.augment_pnt if aug_rng else 0.0)
            x = nn.relu(nn.Dense(self.hidden_dim[0], name=f"proj_in_f{i}")(raw))
            cur_mask = mask
            for li, h in enumerate(self.hidden_dim):
                L = x.shape[1]
                num_que = max(int(L * self.mul_que), 1)
                k = min(num_neb, L)
                sample_rng, sub = jax.random.split(sample_rng)
                que, _ = farthest_point_sampling(sub, x, num_que, mask=cur_mask)
                neb = knn_gather(que, x, k, mask=cur_mask)  # (b, q, k, d)
                b, q = neb.shape[:2]
                y = neb.reshape(b * q, k, neb.shape[-1])
                y = SelfAttention(
                    h, self.num_head, self.dropout[0], name=f"sa{li}_f{i}"
                )(y, deterministic=deterministic)
                y = FefoAttention(
                    h, h * 2, self.dropout[1], name=f"ff{li}_f{i}"
                )(y, deterministic=deterministic)
                y = y.reshape(b, q, k, -1).max(axis=2)
                x = ResidualMLP(
                    [h] + [h * 2] * 4, use_layernorm=True,
                    name=f"up{li}_f{i}",
                )(y)
                cur_mask = jnp.ones(x.shape[:2], dtype=bool)
            x = proj_out(x).max(axis=1)
            if self.share_frame:
                x = x.reshape(nb, nt * nf * x.shape[-1])
            else:
                x = x.reshape(nb, nt * x.shape[-1])
            fs.append(x)
        return jnp.concatenate(fs, axis=-1)
