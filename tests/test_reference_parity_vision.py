"""Cross-framework golden parity, part 8: the pixel policy stack.

Oracle targets (reference file:line):
  - SpatialEmb                    common/modules.py:10-42
  - VisionDiffusionMLP forward    diffusion/mlp_diffusion.py:19-170
  - ViTCritic forward             common/critic.py:116-206

Reading the oracle caught a real deviation here (fixed in
`nets/modules.py`): the repo's SpatialEmb had grown a second
Linear+LayerNorm+ReLU block and a rank-reduced (1, patch_dim, 1) pooling
weight, where the reference uses ONE projection block and a full
(1, patch_dim, proj_dim) weight. These tests pin the corrected structure
end-to-end through both vision models with transported weights.
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
    from dppo.model.common.modules import SpatialEmb as TorchSpatialEmb
    from dppo.model.common.vit import (
        VitEncoder as TorchVitEncoder,
        VitEncoderConfig,
    )
    from dppo.model.common.critic import ViTCritic as TorchViTCritic
    from dppo.model.diffusion.mlp_diffusion import (
        VisionDiffusionMLP as TorchVisionDiffusionMLP,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.nets.critic import ViTCritic
from dppo_tpu.nets.diffusion_mlp import VisionDiffusionMLP
from dppo_tpu.nets.modules import SpatialEmb
from dppo_tpu.nets.vit import VitEncoder

from tests.test_reference_parity import _copy_residual_mlp, _set_linear
from tests.test_reference_parity_more import _set_layernorm, copy_vit

H = W = 48
PROP = 3
ACT, TA = 2, 4
VIT_CFG = dict(
    patch_size=8, depth=1, embed_dim=32, num_heads=4,
    embed_style="embed2", embed_norm=0,
)
NUM_PATCH = 25  # 48x48 embed2
EMBED = 32
SPATIAL = 24


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def copy_spatial_emb(fl, tmod):
    _set_linear(tmod.input_proj[0], fl["Dense_0"])
    _set_layernorm(tmod.input_proj[1], fl["LayerNorm_0"])
    with torch.no_grad():
        tmod.weight.copy_(_t(fl["weight"]))


class TestSpatialEmbParity:
    def test_forward(self):
        femb = SpatialEmb(
            num_patch=NUM_PATCH, patch_dim=EMBED, prop_dim=PROP,
            proj_dim=SPATIAL,
        )
        feat = jax.random.normal(jax.random.key(0), (5, NUM_PATCH, EMBED))
        prop = jax.random.normal(jax.random.key(1), (5, PROP))
        fp = femb.init(jax.random.key(2), feat, prop)
        temb = TorchSpatialEmb(
            num_patch=NUM_PATCH, patch_dim=EMBED, prop_dim=PROP,
            proj_dim=SPATIAL, dropout=0.0,
        )
        copy_spatial_emb(fp["params"], temb)
        temb.eval()
        ours = femb.apply(fp, feat, prop)
        with torch.no_grad():
            theirs = temb(_t(feat), _t(prop))
        assert np.asarray(ours).shape == tuple(theirs.shape)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
        )


def _make_backbone_pair(seed):
    fenc = VitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W, cfg=VIT_CFG
    )
    tenc = TorchVitEncoder(
        obs_shape=[3, H, W], num_channel=3, img_h=H, img_w=W,
        cfg=VitEncoderConfig(**VIT_CFG),
    )
    return fenc, tenc


class TestVisionDiffusionMLPParity:
    def test_forward(self):
        fenc, tenc = _make_backbone_pair(3)
        fnet = VisionDiffusionMLP(
            backbone=fenc,
            action_dim=ACT,
            horizon_steps=TA,
            cond_dim=PROP,
            img_cond_steps=1,
            spatial_emb=SPATIAL,
            time_dim=8,
            mlp_dims=[32, 32, 32],
            residual_style=True,
        )
        B = 4
        x = jax.random.normal(jax.random.key(4), (B, TA, ACT))
        t = jax.random.randint(jax.random.key(5), (B,), 0, 10)
        cond = {
            "state": jax.random.normal(jax.random.key(6), (B, 1, PROP)),
            "rgb": jax.random.uniform(
                jax.random.key(7), (B, 1, 3, H, W), minval=0, maxval=255
            ),
        }
        fp = fnet.init(jax.random.key(8), x, t, cond)
        tnet = TorchVisionDiffusionMLP(
            backbone=tenc,
            action_dim=ACT,
            horizon_steps=TA,
            cond_dim=PROP,
            img_cond_steps=1,
            spatial_emb=SPATIAL,
            time_dim=8,
            mlp_dims=[32, 32, 32],
            residual_style=True,
        )
        p = fp["params"]
        copy_vit({"params": p["backbone"]}, tnet.backbone)
        copy_spatial_emb(p["compress"], tnet.compress)
        _set_linear(tnet.time_embedding[1], p["TimeEmbedding_0"]["Dense_0"])
        _set_linear(tnet.time_embedding[3], p["TimeEmbedding_0"]["Dense_1"])
        _copy_residual_mlp(p["ResidualMLP_0"], tnet.mlp_mean)
        tnet.eval()
        ours = fnet.apply(fp, x, t, cond)
        with torch.no_grad():
            theirs = tnet(
                _t(x),
                torch.from_numpy(np.asarray(t)),
                cond={"state": _t(cond["state"]), "rgb": _t(cond["rgb"])},
            )
        assert np.asarray(ours).shape == tuple(theirs.shape)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4
        )


class TestViTCriticParity:
    def test_forward(self):
        fenc, tenc = _make_backbone_pair(9)
        fcrit = ViTCritic(
            backbone=fenc,
            cond_dim=PROP,
            mlp_dims=[32, 32, 32],
            spatial_emb=SPATIAL,
            residual_style=True,
        )
        B = 4
        cond = {
            "state": jax.random.normal(jax.random.key(10), (B, 1, PROP)),
            "rgb": jax.random.uniform(
                jax.random.key(11), (B, 1, 3, H, W), minval=0, maxval=255
            ),
        }
        fp = fcrit.init(jax.random.key(12), cond)
        tcrit = TorchViTCritic(
            backbone=tenc,
            cond_dim=PROP,
            mlp_dims=[32, 32, 32],
            spatial_emb=SPATIAL,
            residual_style=True,
        )
        p = fp["params"]
        copy_vit({"params": p["backbone"]}, tcrit.backbone)
        copy_spatial_emb(p["compress"], tcrit.compress)
        _copy_residual_mlp(p["ResidualMLP_0"], tcrit.Q1)
        tcrit.eval()
        ours = fcrit.apply(fp, cond)
        with torch.no_grad():
            theirs = tcrit({"state": _t(cond["state"]), "rgb": _t(cond["rgb"])})
        assert np.asarray(ours).reshape(-1).shape == tuple(
            theirs.reshape(-1).shape
        )
        np.testing.assert_allclose(
            np.asarray(ours).reshape(-1),
            theirs.numpy().reshape(-1),
            rtol=1e-3,
            atol=1e-4,
        )
