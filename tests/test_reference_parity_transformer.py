"""Cross-framework golden parity, part 9: transformer policy heads.

Oracle targets (reference file:line):
  - Transformer encoder-decoder core  common/transformer.py:217-340
    (cond embedding + learned positional embeddings, Linear-Mish-Linear
    cond encoder at n_cond_layers=0, pre-LN torch TransformerDecoder
    layers, final LayerNorm + head)
  - Gaussian_Transformer              common/transformer.py:16-100
  - GMM_Transformer                   common/transformer.py:102-215

Weight transport maps flax MultiHeadDotProductAttention (separate q/k/v
kernels (E, H, Hd)) onto torch nn.MultiheadAttention's packed
in_proj_weight (3E, E).

Upstream note: the reference GMM_Transformer's LEARNED-std branch slices
`out[:, :, M*A : -num_modes]` (transformer.py:197-201) — a stale remnant
of mode-weights-in-output (see the commented-out line at :213) that makes
the subsequent reshape raise for any num_modes > 0; its shipped configs
use fixed_std. The oracle therefore covers the runnable fixed/learned-
fixed-std variants.
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
    from dppo.model.common.transformer import (
        Gaussian_Transformer as TorchGaussianTransformer,
        GMM_Transformer as TorchGMMTransformer,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.nets.transformer import GaussianTransformer, GMMTransformer

from tests.test_reference_parity import _set_linear
from tests.test_reference_parity_more import _set_layernorm

OBS, ACT, TA = 11, 3, 4
EMB, HEADS, LAYERS = 32, 4, 2


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _set_mha(fl, tmha, E):
    def flat(name):
        k = np.asarray(fl[name]["kernel"]).reshape(E, E)
        b = np.asarray(fl[name]["bias"]).reshape(E)
        return k, b

    kq, bq = flat("query")
    kk, bk = flat("key")
    kv, bv = flat("value")
    with torch.no_grad():
        tmha.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([kq.T, kk.T, kv.T], axis=0).copy())
        )
        tmha.in_proj_bias.copy_(
            torch.from_numpy(np.concatenate([bq, bk, bv]).copy())
        )
        out_k = np.asarray(fl["out"]["kernel"]).reshape(E, E)
        tmha.out_proj.weight.copy_(torch.from_numpy(out_k.T.copy()))
        tmha.out_proj.bias.copy_(
            torch.from_numpy(np.asarray(fl["out"]["bias"]).copy())
        )


def _copy_decoder_layer(fl, tlayer, E):
    _set_layernorm(tlayer.norm1, fl["LayerNorm_0"])
    _set_mha(fl["MultiHeadDotProductAttention_0"], tlayer.self_attn, E)
    _set_layernorm(tlayer.norm2, fl["LayerNorm_1"])
    _set_mha(fl["MultiHeadDotProductAttention_1"], tlayer.multihead_attn, E)
    _set_layernorm(tlayer.norm3, fl["LayerNorm_2"])
    _set_linear(tlayer.linear1, fl["Dense_0"])
    _set_linear(tlayer.linear2, fl["Dense_1"])


def copy_transformer(fl, tnet):
    """fl: flax Transformer params subtree; tnet: torch Transformer."""
    _set_linear(tnet.cond_obs_emb, fl["cond_obs_emb"])
    with torch.no_grad():
        tnet.cond_pos_emb.copy_(_t(fl["cond_pos_emb"]))
        tnet.pos_emb.copy_(_t(fl["pos_emb"]))
    # n_cond_layers == 0 branch: Linear-Mish-Linear encoder
    _set_linear(tnet.encoder[0], fl["Dense_0"])
    _set_linear(tnet.encoder[2], fl["Dense_1"])
    for i in range(LAYERS):
        _copy_decoder_layer(fl[f"dec{i}"], tnet.decoder.layers[i], EMB)
    _set_layernorm(tnet.ln_f, fl["ln_f"])
    _set_linear(tnet.head, fl["head"])


def _cond(seed, B=5):
    state = jax.random.normal(jax.random.key(seed), (B, 1, OBS))
    return {"state": state}, {"state": _t(state)}


class TestGaussianTransformerParity:
    @pytest.mark.parametrize(
        "fixed_std,learn", [(None, False), (0.1, False), (0.1, True)]
    )
    def test_forward(self, fixed_std, learn):
        kw = dict(
            action_dim=ACT,
            horizon_steps=TA,
            cond_dim=OBS,
            transformer_embed_dim=EMB,
            transformer_num_heads=HEADS,
            transformer_num_layers=LAYERS,
            fixed_std=fixed_std,
            learn_fixed_std=learn,
        )
        fnet = GaussianTransformer(**kw)
        cond_j, cond_t = _cond(100)
        fp = fnet.init(jax.random.key(101), cond_j)
        tnet = TorchGaussianTransformer(**kw)
        copy_transformer(fp["params"]["transformer"], tnet.transformer)
        if learn:
            with torch.no_grad():
                tnet.logvar.copy_(_t(fp["params"]["logvar"]))
        tnet.eval()
        mean_j, scale_j = fnet.apply(fp, cond_j)
        with torch.no_grad():
            mean_t, scale_t = tnet(cond_t)
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(scale_j),
            np.broadcast_to(scale_t.numpy(), np.asarray(scale_j).shape),
            rtol=1e-3,
            atol=1e-5,
        )


class TestGMMTransformerParity:
    @pytest.mark.parametrize("learn", [False, True])
    def test_forward_fixed_std(self, learn):
        kw = dict(
            action_dim=ACT,
            horizon_steps=TA,
            cond_dim=OBS,
            num_modes=3,
            transformer_embed_dim=EMB,
            transformer_num_heads=HEADS,
            transformer_num_layers=LAYERS,
            fixed_std=0.1,
            learn_fixed_std=learn,
        )
        fnet = GMMTransformer(**kw)
        cond_j, cond_t = _cond(102)
        fp = fnet.init(jax.random.key(103), cond_j)
        tnet = TorchGMMTransformer(**kw)
        copy_transformer(fp["params"]["transformer"], tnet.transformer)
        _set_linear(tnet.modes_head, fp["params"]["modes_head"])
        if learn:
            with torch.no_grad():
                tnet.logvar.copy_(_t(fp["params"]["logvar"]))
        tnet.eval()
        mean_j, scale_j, w_j = fnet.apply(fp, cond_j)
        with torch.no_grad():
            mean_t, scale_t, w_t = tnet(cond_t)
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(scale_j),
            np.broadcast_to(scale_t.numpy(), np.asarray(scale_j).shape),
            rtol=1e-3,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(w_j), w_t.numpy(), rtol=1e-3, atol=1e-4
        )
