"""Fused Pallas chain kernel must match the reference lax.scan sampler
bit-for-bit given the same noise (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.diffusion.vpg import VPGDiffusion
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from dppo_tpu.ops.pallas.fused_chain import (
    FusedChainSampler,
    pack_diffusion_mlp,
    precompute_time_embeddings,
)

B, Ta, Da, Do, K, K_ft = 5, 4, 3, 11, 8, 4


def _model(**kw):
    actor = DiffusionMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, time_dim=16,
        mlp_dims=[64, 64, 64], activation_type="ReLU", residual_style=True,
    )
    critic = CriticObs(cond_dim=Do, mlp_dims=[32, 32])
    return VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=kw.pop("ft", K_ft),
        horizon_steps=Ta, obs_dim=Do, action_dim=Da, denoising_steps=K,
        min_sampling_denoising_std=0.1, randn_clip_value=3, **kw,
    )


def _reference_chain_with_noise(model, params, cond, x0, noise, deterministic,
                                use_base_policy=False):
    """Re-run the model's sampling math step by step with fixed noise."""
    K_total = model.denoising_steps
    base_steps = K_total - model.ft_denoising_steps
    t_all = np.asarray(model.t_schedule())
    x = x0
    states = [x0]
    sample_actor = params.actor if use_base_policy else params.actor_ft
    for i, t in enumerate(t_all):
        actor = params.actor if i < base_steps else sample_actor
        t_b = jnp.full((x.shape[0],), int(t), dtype=jnp.int32)
        mean, logvar, _ = model.p_mean_var_ft(actor, x, t_b, cond)
        std = jnp.exp(0.5 * logvar)
        if deterministic:
            std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
        else:
            std = jnp.clip(std, model.min_sampling_denoising_std, None)
        x = mean + std * noise[i]
        states.append(x)
    return jnp.stack(states)


@pytest.mark.parametrize("ft", [K, 4])
@pytest.mark.parametrize("deterministic", [False, True])
def test_fused_chain_matches_scan(ft, deterministic):
    model = _model(ft=ft)
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, Do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    # make ft differ from base so dispatch errors are visible
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft)
    )
    sampler = FusedChainSampler(model)
    rng = jax.random.key(2)

    # same noise as the fused path draws
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, Ta * Da))
    noise = jnp.clip(
        jax.random.normal(rng_n, (K, B, Ta * Da)), -3, 3
    )

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=deterministic)

    ref_chain = _reference_chain_with_noise(
        model, params, cond,
        x0.reshape(B, Ta, Da),
        noise.reshape(K, B, Ta, Da),
        deterministic,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories),
        np.asarray(ref_chain[-1]),
        rtol=2e-4,
        atol=2e-5,
    )
    # recorded chain window: last ft+1 states, batch-major
    expected_rec = jnp.swapaxes(ref_chain[K - ft :], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-5
    )


def test_packing_roundtrip():
    model = _model()
    cond = {"state": jnp.zeros((2, 1, Do))}
    params = model.init_vpg_params(jax.random.key(0), cond)
    packed = pack_diffusion_mlp(params.actor, Ta * Da, 16, Do)
    # zero-padded rows must not change the product
    x = jax.random.normal(jax.random.key(1), (2, packed.w0.shape[0]))
    in_dim = Ta * Da + 16 + Do
    full = x @ packed.w0
    trunc = x[:, :in_dim] @ packed.w0[:in_dim]
    np.testing.assert_allclose(np.asarray(full), np.asarray(trunc), rtol=1e-5)
    temb = precompute_time_embeddings(
        params.actor, model.t_schedule(), 16
    )
    assert temb.shape == (K, 16)
