"""Cross-framework golden parity, part 10: Gaussian_VisionMLP.

Oracle target: `common/mlp_gaussian.py:112-275` — ViT backbone +
SpatialEmb compress + Gaussian head. Reading the oracle caught two more
repo deviations in the learned-std branch (both fixed): the reference's
logvar head is a plain one-hidden-layer MLP (`[input, mlp_dims[-1],
out]`) and its logvar is CLAMPED to [logvar_min, logvar_max] — the state
Gaussian head's tanh-range mapping does not apply to the vision head.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

try:
    from dppo.model.common.mlp_gaussian import (
        Gaussian_VisionMLP as TorchGaussianVisionMLP,
    )
    from dppo.model.common.vit import (
        VitEncoder as TorchVitEncoder,
        VitEncoderConfig,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.nets.gaussian_mlp import GaussianVisionMLP
from dppo_tpu.nets.vit import VitEncoder

from tests.test_reference_parity import _copy_plain_mlp, _copy_residual_mlp
from tests.test_reference_parity_more import copy_vit
from tests.test_reference_parity_vision import copy_spatial_emb

H = W = 48
PROP, ACT, TA = 3, 2, 4
VIT_CFG = dict(
    patch_size=8, depth=1, embed_dim=32, num_heads=4,
    embed_style="embed2", embed_norm=0,
)


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _copy_point_encoder(fl, tenc, n_hidden):
    from tests.test_reference_parity import _set_linear

    for li in range(n_hidden):
        _set_linear(tenc.lyrs[li][0][0], fl[f"lyr{li}_f0"])
        _set_linear(tenc.glyrs[li][0][0], fl[f"glyr{li}_f0"])
    _set_linear(tenc.proj_out, fl["proj_out"])


def test_point_encoder_forward_equal_valid_counts():
    """PointEncoder vs the reference (`point_encoder.py:8-75`). The
    reference's process_point TRUNCATES every cloud to the batch-min valid
    length (dynamic shapes; rows with more valid points lose them) — the
    repo's masked max-pool keeps static shapes and all valid points
    (PARITY deviation #4). On batches where every row has the SAME valid
    count the two are mathematically identical — oracle-pinned here.

    The reference point modules import pytorch3d at module scope (absent
    from this image), so these oracles only run where it is installed;
    the repo's own golden tests (tests/test_nets_extra.py:77-136) cover
    the masked-pooling math everywhere."""
    pytest.importorskip("pytorch3d")
    from dppo.model.common.point_encoder import PointEncoder as TorchPointEncoder

    from dppo_tpu.nets.point_encoder import PointEncoder

    kw = dict(
        in_dim=3, n_step=1, n_frame=1, hidden_dim=(8, 16), embed_dim=16,
        augment_pnt=0.0,
    )
    fenc = PointEncoder(**kw)
    # 20 valid + 6 zero-pad rows, SAME count for every batch element
    pts = np.zeros((4, 1, 1, 26, 3), np.float32)
    pts[:, :, :, :20] = np.random.default_rng(0).standard_normal(
        (4, 1, 1, 20, 3)
    )
    fp = fenc.init(jax.random.key(130), jnp.asarray(pts))
    tenc = TorchPointEncoder(**{**kw, "hidden_dim": tuple(kw["hidden_dim"])})
    _copy_point_encoder(fp["params"], tenc, n_hidden=2)
    tenc.eval()
    ours = fenc.apply(fp, jnp.asarray(pts))
    with torch.no_grad():
        theirs = tenc(_t(pts))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_gaussian_point_mlp_forward():
    """Gaussian_PointMLP (`mlp_gaussian.py:15-110`), learned-std variant.
    Requires pytorch3d (see test_point_encoder_forward_equal_valid_counts)."""
    pytest.importorskip("pytorch3d")
    from dppo.model.common.mlp_gaussian import (
        Gaussian_PointMLP as TorchGaussianPointMLP,
    )
    from dppo.model.common.point_encoder import PointEncoder as TorchPointEncoder

    from dppo_tpu.nets.gaussian_mlp import GaussianPointMLP
    from dppo_tpu.nets.point_encoder import PointEncoder

    enc_kw = dict(
        in_dim=3, n_step=1, n_frame=1, hidden_dim=(8, 16), embed_dim=16,
        augment_pnt=0.0,
    )
    head_kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=PROP,
        mlp_dims=[32, 32, 32],
        residual_style=True,
    )
    fnet = GaussianPointMLP(backbone=PointEncoder(**enc_kw), **head_kw)
    B = 4
    pts = np.zeros((B, 1, 1, 26, 3), np.float32)
    pts[:, :, :, :20] = np.random.default_rng(1).standard_normal(
        (B, 1, 1, 20, 3)
    )
    cond_j = {
        "state": jax.random.normal(jax.random.key(131), (B, 1, PROP)),
        "point": jnp.asarray(pts),
    }
    fp = fnet.init(jax.random.key(132), cond_j)
    tnet = TorchGaussianPointMLP(
        backbone=TorchPointEncoder(
            **{**enc_kw, "hidden_dim": tuple(enc_kw["hidden_dim"])}
        ),
        **head_kw,
    )
    p = fp["params"]
    _copy_point_encoder(p["backbone"], tnet.backbone, n_hidden=2)
    _copy_residual_mlp(p["ResidualMLP_0"], tnet.mlp_mean)
    _copy_plain_mlp(p["MLP_0"], tnet.mlp_logvar)
    tnet.eval()
    mean_j, scale_j = fnet.apply(fp, cond_j)
    with torch.no_grad():
        mean_t, scale_t = tnet(
            {"state": _t(cond_j["state"]), "point": _t(pts)}
        )
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scale_j),
        np.broadcast_to(scale_t.numpy(), np.asarray(scale_j).shape),
        rtol=1e-3,
        atol=1e-5,
    )


def test_vision_unet1d_forward():
    """VisionUnet1D (`unet.py:330-530`): ViT + SpatialEmb compress feeding
    the U-Net condition as [feat, state]; the repo wraps the shared Unet1D
    while the reference re-implements the block stack inline — identical
    structure, verified by transporting the inner U-Net weights onto the
    reference's top-level modules."""
    from dppo.model.diffusion.unet import VisionUnet1D as TorchVisionUnet1D

    from dppo_tpu.nets.unet import VisionUnet1D
    from tests.test_reference_parity_unet import copy_unet1d

    fenc = VitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W, cfg=VIT_CFG
    )
    kw = dict(
        action_dim=ACT,
        img_cond_steps=1,
        cond_dim=PROP,
        diffusion_step_embed_dim=16,
        dim=16,
        dim_mults=(1, 2),
        kernel_size=5,
        n_groups=4,
        cond_predict_scale=True,
        spatial_emb=24,
    )
    fnet = VisionUnet1D(backbone=fenc, **kw)
    B = 4
    x = jax.random.normal(jax.random.key(120), (B, TA, ACT))
    t = jax.random.randint(jax.random.key(121), (B,), 0, 10)
    cond_j = {
        "state": jax.random.normal(jax.random.key(122), (B, 1, PROP)),
        "rgb": jax.random.uniform(
            jax.random.key(123), (B, 1, 3, H, W), minval=0, maxval=255
        ),
    }
    fp = fnet.init(jax.random.key(124), x, t, cond_j)
    tenc = TorchVitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W,
        cfg=VitEncoderConfig(**VIT_CFG),
    )
    tkw = dict(kw)
    tkw["dim_mults"] = tuple(kw["dim_mults"])
    tnet = TorchVisionUnet1D(backbone=tenc, **tkw)
    p = fp["params"]
    copy_vit({"params": p["backbone"]}, tnet.backbone)
    copy_spatial_emb(p["compress"], tnet.compress)
    copy_unet1d({"params": p["unet"]}, tnet, n_resolutions=2)
    tnet.eval()
    ours = fnet.apply(fp, x, t, cond_j)
    with torch.no_grad():
        theirs = tnet(
            _t(x),
            torch.from_numpy(np.asarray(t)),
            cond={"state": _t(cond_j["state"]), "rgb": _t(cond_j["rgb"])},
        )
    assert np.asarray(ours).shape == tuple(theirs.shape)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize(
    "fixed_std,learn", [(None, False), (0.1, False), (0.1, True)]
)
def test_gaussian_vision_mlp_forward(fixed_std, learn):
    fenc = VitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W, cfg=VIT_CFG
    )
    kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=PROP,
        img_cond_steps=1,
        mlp_dims=[32, 32, 32],
        residual_style=True,
        spatial_emb=24,
        fixed_std=fixed_std,
        learn_fixed_std=learn,
    )
    fnet = GaussianVisionMLP(backbone=fenc, **kw)
    B = 4
    cond_j = {
        "state": jax.random.normal(jax.random.key(110), (B, 1, PROP)),
        "rgb": jax.random.uniform(
            jax.random.key(111), (B, 1, 3, H, W), minval=0, maxval=255
        ),
    }
    fp = fnet.init(jax.random.key(112), cond_j)
    tenc = TorchVitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W,
        cfg=VitEncoderConfig(**VIT_CFG),
    )
    tnet = TorchGaussianVisionMLP(backbone=tenc, **kw)
    p = fp["params"]
    copy_vit({"params": p["backbone"]}, tnet.backbone)
    copy_spatial_emb(p["compress"], tnet.compress)
    if "ResidualMLP_0" in p:
        _copy_residual_mlp(p["ResidualMLP_0"], tnet.mlp_mean)
    else:
        _copy_plain_mlp(p["MLP_0"], tnet.mlp_mean)
    if fixed_std is None:
        _copy_plain_mlp(p["MLP_0"], tnet.mlp_logvar)
    if learn:
        with torch.no_grad():
            tnet.logvar.copy_(_t(p["logvar"]))
    tnet.eval()
    mean_j, scale_j = fnet.apply(fp, cond_j)
    with torch.no_grad():
        mean_t, scale_t = tnet(
            {"state": _t(cond_j["state"]), "rgb": _t(cond_j["rgb"])}
        )
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scale_j),
        np.broadcast_to(scale_t.numpy(), np.asarray(scale_j).shape),
        rtol=1e-3,
        atol=1e-5,
    )
