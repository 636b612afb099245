"""Golden tests for the TPU-native cond-encoding hoist.

The visual/point condition encoder is loop-invariant across the K-step
denoising scan, so samplers encode once and replay the feature
(`encode_cond_once` / `cond_feat`). These tests pin that the hoisted
sampler and log-prob paths are numerically identical to the re-encode
reference path (`disable_cond_hoist=True` runs the exact pre-hoist code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dppo_tpu.diffusion.ppo import PPODiffusion
from dppo_tpu.nets.critic import ViTCritic
from dppo_tpu.nets.diffusion_mlp import VisionDiffusionMLP
from dppo_tpu.nets.unet import VisionUnet1D
from dppo_tpu.nets.vit import VitEncoder


def _vit(h=16, w=16):
    return VitEncoder(
        obs_shape=(3, h, w),
        num_channel=3,
        img_h=h,
        img_w=w,
        cfg={"patch_size": 8, "depth": 1, "embed_dim": 32, "num_heads": 2,
             "embed_style": "embed2", "embed_norm": 0},
    )


def _model(actor, use_ddim, K=6, ft=3, horizon=2, act_dim=1, obs_dim=2):
    critic = ViTCritic(
        backbone=_vit(),
        cond_dim=obs_dim,
        spatial_emb=16,
        mlp_dims=[32, 32, 32],
        residual_style=True,
    )
    kwargs = dict(ddim_steps=ft + 1) if use_ddim else {}
    return PPODiffusion(
        gamma_denoising=0.99,
        clip_ploss_coef=0.01,
        clip_ploss_coef_base=0.01,
        clip_ploss_coef_rate=3,
        randn_clip_value=3,
        min_sampling_denoising_std=0.1,
        min_logprob_denoising_std=0.1,
        actor=actor,
        critic=critic,
        ft_denoising_steps=ft,
        horizon_steps=horizon,
        obs_dim=obs_dim,
        action_dim=act_dim,
        denoising_steps=K,
        use_ddim=use_ddim,
        **kwargs,
    )


def _mlp_actor(horizon=2, act_dim=1, obs_dim=2):
    return VisionDiffusionMLP(
        backbone=_vit(),
        action_dim=act_dim,
        horizon_steps=horizon,
        cond_dim=obs_dim,
        img_cond_steps=1,
        spatial_emb=16,
        time_dim=8,
        mlp_dims=[32, 32, 32],
        residual_style=True,
    )


def _unet_actor(horizon=4, act_dim=1, obs_dim=2):
    return VisionUnet1D(
        backbone=_vit(),
        action_dim=act_dim,
        img_cond_steps=1,
        cond_dim=obs_dim,
        diffusion_step_embed_dim=8,
        dim=8,
        dim_mults=(1, 2),
        smaller_encoder=False,
        cond_mlp_dims=[16, 8],
        spatial_emb=16,
    )


def _cond(B=4, h=16, w=16, obs_dim=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "state": jnp.asarray(
            rng.standard_normal((B, 1, obs_dim)), jnp.float32
        ),
        "rgb": jnp.asarray(
            rng.uniform(size=(B, 1, 3, h, w)), jnp.float32
        ),
    }


@pytest.mark.parametrize("use_ddim", [False, True])
@pytest.mark.parametrize("actor_kind", ["mlp", "unet"])
def test_sample_and_logprobs_match_reencode_path(use_ddim, actor_kind):
    horizon = 2 if actor_kind == "mlp" else 4
    actor = _mlp_actor(horizon) if actor_kind == "mlp" else _unet_actor(horizon)
    model = _model(actor, use_ddim, horizon=horizon)
    cond = _cond()
    params = model.init_vpg_params(jax.random.key(0), cond)

    s_hoist = model.sample(params, cond, jax.random.key(1), return_chain=True)
    model.disable_cond_hoist = True
    s_ref = model.sample(params, cond, jax.random.key(1), return_chain=True)
    model.disable_cond_hoist = False

    np.testing.assert_allclose(
        np.asarray(s_hoist.trajectories), np.asarray(s_ref.trajectories),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_hoist.chains), np.asarray(s_ref.chains),
        rtol=1e-5, atol=1e-5,
    )

    lp_hoist = model.get_logprobs(params, cond, s_ref.chains)
    model.disable_cond_hoist = True
    lp_ref = model.get_logprobs(params, cond, s_ref.chains)
    model.disable_cond_hoist = False
    np.testing.assert_allclose(
        np.asarray(lp_hoist), np.asarray(lp_ref), rtol=1e-5, atol=1e-5
    )


def test_state_only_network_is_unaffected():
    from dppo_tpu.nets.critic import CriticObs
    from dppo_tpu.nets.diffusion_mlp import DiffusionMLP

    actor = DiffusionMLP(
        action_dim=1, horizon_steps=2, cond_dim=2, time_dim=8,
        mlp_dims=[32, 32, 32], residual_style=True,
    )
    model = _model(actor, use_ddim=False)
    model.critic = CriticObs(
        cond_dim=2, mlp_dims=[32, 32, 32], residual_style=True
    )
    cond = {"state": _cond()["state"]}
    params = model.init_vpg_params(jax.random.key(0), cond)
    assert model.encode_cond_once(params.actor, cond) is None
    s = model.sample(params, cond, jax.random.key(1), return_chain=True)
    assert s.trajectories.shape == (4, 2, 1)


def test_bf16_sampling_composes_with_hoist():
    actor = _mlp_actor()
    model = _model(actor, use_ddim=False)
    model.sample_network_dtype = jnp.bfloat16
    cond = _cond()
    params = model.init_vpg_params(jax.random.key(0), cond)
    s_hoist = model.sample(params, cond, jax.random.key(1), return_chain=True)
    model.disable_cond_hoist = True
    s_ref = model.sample(params, cond, jax.random.key(1), return_chain=True)
    np.testing.assert_allclose(
        np.asarray(s_hoist.trajectories), np.asarray(s_ref.trajectories),
        rtol=2e-2, atol=2e-2,
    )
