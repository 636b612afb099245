"""Shape/behavior tests for ViT, U-Net, transformer heads, point encoders,
FPS/KNN."""

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.nets.point_encoder import PointEncoder, PointEncoderSA
from dppo_tpu.nets.transformer import GaussianTransformer, GMMTransformer
from dppo_tpu.nets.unet import Unet1D
from dppo_tpu.nets.vit import VitEncoder
from dppo_tpu.ops.fps_knn import farthest_point_sampling, knn_gather, valid_mask


def test_vit_encoder_shapes():
    enc = VitEncoder(
        obs_shape=[3, 96, 96],
        num_channel=3,
        img_h=96,
        img_w=96,
        cfg={"patch_size": 8, "depth": 1, "embed_dim": 64, "num_heads": 4,
             "embed_style": "embed2", "embed_norm": 0},
    )
    x = jnp.ones((2, 3, 96, 96)) * 128.0
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, enc.num_patch, 64)
    assert enc.num_patch == 121  # 96x96, embed2 -> 11x11


def test_unet1d_shapes_and_grad():
    net = Unet1D(
        action_dim=3, cond_dim=11, diffusion_step_embed_dim=16, dim=16,
        dim_mults=[1, 2], kernel_size=5, n_groups=8, cond_predict_scale=True,
        smaller_encoder=False,
    )
    x = jnp.ones((4, 8, 3))
    t = jnp.arange(4)
    cond = {"state": jnp.ones((4, 1, 11))}
    params = net.init(jax.random.key(0), x, t, cond)
    out = net.apply(params, x, t, cond)
    assert out.shape == (4, 8, 3)
    g = jax.grad(
        lambda p: jnp.sum(net.apply(p, x, t, cond) ** 2)
    )(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_gaussian_transformer_shapes():
    net = GaussianTransformer(
        action_dim=3, horizon_steps=4, cond_dim=11,
        transformer_embed_dim=32, transformer_num_heads=4,
        transformer_num_layers=2,
    )
    cond = {"state": jnp.ones((2, 1, 11))}
    params = net.init(jax.random.key(0), cond)
    mean, scale = net.apply(params, cond)
    assert mean.shape == (2, 12) and scale.shape == (2, 12)
    assert np.all(np.abs(np.asarray(mean)) <= 1.0)


def test_gmm_transformer_shapes():
    net = GMMTransformer(
        action_dim=3, horizon_steps=4, cond_dim=11, num_modes=3,
        transformer_embed_dim=32, transformer_num_heads=4,
        transformer_num_layers=2,
    )
    cond = {"state": jnp.ones((2, 1, 11))}
    params = net.init(jax.random.key(0), cond)
    mean, scale, logits = net.apply(params, cond)
    assert mean.shape == (2, 3, 12)
    assert scale.shape == (2, 3, 12)
    assert logits.shape == (2, 3)


def test_fps_selects_spread_points():
    # 4 corner clusters; FPS with k=4 must pick one from each corner
    rng = np.random.default_rng(0)
    corners = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], dtype=np.float32)
    pts = np.concatenate(
        [c + 0.1 * rng.standard_normal((20, 2)).astype(np.float32) for c in corners]
    )[None]
    sampled, idx = farthest_point_sampling(
        jax.random.key(1), jnp.asarray(pts), 4
    )
    got_corners = set()
    for p in np.asarray(sampled[0]):
        d = np.linalg.norm(corners - p, axis=-1)
        got_corners.add(int(np.argmin(d)))
    assert len(got_corners) == 4


def test_fps_knn_respect_padding():
    pts = np.zeros((1, 10, 3), dtype=np.float32)
    pts[0, :4] = np.random.default_rng(0).standard_normal((4, 3))
    # rest are zero-padding
    mask = valid_mask(jnp.asarray(pts))
    assert int(mask.sum()) == 4
    sampled, idx = farthest_point_sampling(jax.random.key(0), jnp.asarray(pts), 3)
    assert np.all(np.asarray(idx) < 4)  # never selects padded points
    neb = knn_gather(sampled, jnp.asarray(pts), 2)
    # neighbors must come from valid points (nonzero rows)
    assert np.all(np.any(np.asarray(neb) != 0, axis=-1))


def test_point_encoder_shapes():
    enc = PointEncoder(
        in_dim=3, n_step=1, n_frame=2, hidden_dim=(16, 32, 48), embed_dim=32
    )
    x = np.random.default_rng(0).standard_normal((2, 1, 2, 64, 3)).astype(
        np.float32
    )
    x[..., 50:, :] = 0  # back-padded
    params = enc.init(jax.random.key(0), jnp.asarray(x))
    out = enc.apply(params, jnp.asarray(x))
    assert out.shape == (2, 32)


def test_point_encoder_padding_invariance():
    """Masked max-pooling must ignore zero-padded points entirely."""
    enc = PointEncoder(
        in_dim=3, n_step=1, n_frame=1, hidden_dim=(8, 16), embed_dim=16
    )
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 1, 1, 32, 3)).astype(np.float32)
    padded = np.concatenate(
        [base, np.zeros((1, 1, 1, 16, 3), np.float32)], axis=3
    )
    params = enc.init(jax.random.key(0), jnp.asarray(base))
    out1 = enc.apply(params, jnp.asarray(base))
    out2 = enc.apply(params, jnp.asarray(padded))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_point_encoder_sa_shapes():
    enc = PointEncoderSA(
        in_dim=3, n_step=1, n_frame=1, hidden_dim=(16, 32), embed_dim=32,
        num_head=4,
    )
    x = np.random.default_rng(0).standard_normal((2, 1, 1, 64, 3)).astype(
        np.float32
    )
    params = enc.init(jax.random.key(0), jnp.asarray(x))
    out = enc.apply(params, jnp.asarray(x))
    assert out.shape == (2, 32)
