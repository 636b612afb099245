"""Unet chain kernel: packed-forward equivalence + interpreter-mode chain.

Part 1 pins the kernel-safe padded forward (`unet_trunk_step`) against the
flax `Unet1D.apply` at every shipped operating-point shape (dims 32/40/64,
dim_mults (1,2)/(1,2,4), Ta 4/16, GroupNorm on/off, cond_predict_scale,
cond-MLP vs larger FiLM encoder). Part 2 (in test_fused_chain_unet_kernel)
runs the full Pallas chain in interpreter mode against VPGDiffusion.sample.
"""

import jax

# the CPU backend's default matmul path is batch-shape-dependent (a
# (1,32)@(32,128) and a (3,32)@(32,128) product differ by up to 2e-2);
# full-precision matmuls make packed-vs-flax comparisons meaningful
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
import pytest

from dppo_tpu.nets.unet import Unet1D
from dppo_tpu.ops.pallas.fused_chain_unet import (
    _cp,
    build_unet_spec,
    pack_unet1d,
    precompute_unet_film,
    unet_trunk_step,
)

SHAPES = [
    # (dim, mults, Ta, act_dim, n_groups, cond_predict_scale, cond_mlp_dims, cond_dim)
    (40, (1, 2), 4, 7, 8, True, None, 137),        # robomimic img unet
    (40, (1, 2), 4, 7, None, True, None, 137),     # no-GN variant
    (64, (1, 2, 4), 16, 10, None, True, [256, 128], 58),  # furniture-style
    (32, (1, 2), 4, 3, 8, False, [64, 32], 11),    # small, additive FiLM
    (32, (1, 2, 4), 4, 7, None, True, None, 23),   # T collapses to 1 mid-net
]


def _make(dim, mults, ta, act_dim, n_groups, cps, cond_mlp_dims, cond_dim):
    net = Unet1D(
        action_dim=act_dim,
        cond_dim=cond_dim,
        diffusion_step_embed_dim=32,
        dim=dim,
        dim_mults=mults,
        cond_mlp_dims=cond_mlp_dims,
        kernel_size=5,
        n_groups=n_groups,
        cond_predict_scale=cps,
    )
    B = 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, ta, act_dim)), jnp.float32)
    state = jnp.asarray(rng.standard_normal((B, 1, cond_dim)), jnp.float32)
    t = jnp.asarray([5, 5, 5], jnp.int32)
    params = net.init(jax.random.key(0), x, t, {"state": state})
    return net, params, x, t, state


@pytest.mark.parametrize("shape", SHAPES, ids=[str(s[:3]) for s in SHAPES])
def test_packed_forward_matches_flax(shape):
    dim, mults, ta, act_dim, n_groups, cps, cmlp, cond_dim = shape
    net, params, x, t, state = _make(*shape)
    ref = net.apply(params, x, t, {"state": state})

    spec = build_unet_spec(net, ta)
    packed = pack_unet1d(params, spec)
    t_sched = jnp.asarray([5, 9], jnp.int32)  # step 0 corresponds to t=5
    films = precompute_unet_film(
        params, spec, t_sched, state.reshape(3, -1), cmlp, cond_dim, 32
    )
    films_0 = {k: v[0] for k, v in films.items()}
    c0p = _cp(act_dim)
    rows = [
        jnp.zeros((3, c0p), jnp.float32).at[:, :act_dim].set(x[:, ti])
        for ti in range(ta)
    ]
    out_rows = unet_trunk_step(packed, films_0, spec, rows)
    out = jnp.stack([r[:, :act_dim] for r in out_rows], axis=1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


# ---------------------------------------------------------------------------
# part 2: full-chain kernel in interpreter mode vs the sampling math
# ---------------------------------------------------------------------------

from dppo_tpu.diffusion.vpg import VPGDiffusion
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.ops.pallas.fused_chain_unet import FusedUnetChainSampler

B, K, K_ft = 3, 6, 3


def _vpg_unet(use_ddim, ta=4, act_dim=3, obs_dim=11):
    actor = Unet1D(
        action_dim=act_dim, cond_dim=obs_dim, diffusion_step_embed_dim=16,
        dim=16, dim_mults=(1, 2), kernel_size=5, n_groups=8,
        cond_predict_scale=True,
    )
    critic = CriticObs(cond_dim=obs_dim, mlp_dims=[32, 32])
    kw = dict(ddim_steps=K) if use_ddim else {}
    return VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=K_ft,
        horizon_steps=ta, obs_dim=obs_dim, action_dim=act_dim,
        denoising_steps=K, min_sampling_denoising_std=0.1,
        randn_clip_value=3, use_ddim=use_ddim, **kw,
    )


def _reference_chain_with_noise(model, params, cond, x0, noise, deterministic):
    K_total = model.n_sampling_steps
    base_steps = K_total - model.ft_denoising_steps
    t_all = np.asarray(model.t_schedule())
    eta_value = model._eta_value(params, cond, deterministic)
    x = x0
    states = [x0]
    for i, t in enumerate(t_all):
        actor = params.actor if i < base_steps else params.actor_ft
        t_b = jnp.full((x.shape[0],), int(t), dtype=jnp.int32)
        index_b = jnp.full((x.shape[0],), i, dtype=jnp.int32)
        mean, logvar, _ = model.p_mean_var_ft(
            actor, x, t_b, cond, index=index_b, eta_value=eta_value
        )
        std = jnp.exp(0.5 * logvar)
        if model.use_ddim:
            std = (
                jnp.zeros_like(std)
                if deterministic
                else jnp.clip(std, model.min_sampling_denoising_std, None)
            )
        elif deterministic:
            std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
        else:
            std = jnp.clip(std, model.min_sampling_denoising_std, None)
        x = mean + std * noise[i]
        states.append(x)
    return jnp.stack(states)


@pytest.mark.parametrize("use_ddim", [False, True])
@pytest.mark.parametrize("deterministic", [False, True])
def test_fused_unet_chain_matches_scan(use_ddim, deterministic):
    from jax.experimental.pallas import tpu as pltpu

    ta, da, do = 4, 3, 11
    model = _vpg_unet(use_ddim, ta, da, do)
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft)
    )
    sampler = FusedUnetChainSampler(model)
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, ta * da))
    noise = jnp.clip(jax.random.normal(rng_n, (K, B, ta * da)), -3, 3)

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=deterministic)

    ref_chain = _reference_chain_with_noise(
        model, params, cond, x0.reshape(B, ta, da),
        noise.reshape(K, B, ta, da), deterministic,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories), np.asarray(ref_chain[-1]),
        rtol=2e-4, atol=2e-4,
    )
    expected_rec = jnp.swapaxes(ref_chain[K - K_ft:], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-4
    )


def _unet_actor(ta, da, do):
    from dppo_tpu.nets.unet import VisionUnet1D
    from dppo_tpu.nets.vit import VitEncoder

    vit = VitEncoder(
        obs_shape=(3, 16, 16), num_channel=3, img_h=16, img_w=16,
        cfg={"patch_size": 8, "depth": 1, "embed_dim": 32, "num_heads": 2,
             "embed_style": "embed2", "embed_norm": 0},
    )
    return VisionUnet1D(
        backbone=vit, action_dim=da, img_cond_steps=1, cond_dim=do,
        diffusion_step_embed_dim=16, dim=16, dim_mults=(1, 2),
        kernel_size=5, n_groups=8, cond_predict_scale=True, spatial_emb=16,
    )


def _cond(B, obs_dim=2, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "state": jnp.asarray(rng.standard_normal((B, 1, obs_dim)), jnp.float32),
        "rgb": jnp.asarray(rng.uniform(size=(B, 1, 3, h, w)), jnp.float32),
    }


def test_fused_vision_unet_chain_matches_scan():
    """VisionUnet1D through the kernel: the ViT feature enters via the
    cond-hoist, the U-Net trunk runs in the fused chain."""
    from jax.experimental.pallas import tpu as pltpu

    ta, da, do = 4, 3, 2
    actor = _unet_actor(ta, da, do)
    critic = CriticObs(cond_dim=do, mlp_dims=[32, 32])
    model = VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=K_ft,
        horizon_steps=ta, obs_dim=do, action_dim=da,
        denoising_steps=K, min_sampling_denoising_std=0.1,
        randn_clip_value=3,
    )
    cond = _cond(B, obs_dim=do)
    params = model.init_vpg_params(jax.random.key(1), cond)
    sampler = FusedUnetChainSampler(model)
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, ta * da))
    noise = jnp.clip(jax.random.normal(rng_n, (K, B, ta * da)), -3, 3)

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=False)

    ref_chain = _reference_chain_with_noise(
        model, params, cond, x0.reshape(B, ta, da),
        noise.reshape(K, B, ta, da), False,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories), np.asarray(ref_chain[-1]),
        rtol=5e-4, atol=5e-4,
    )
