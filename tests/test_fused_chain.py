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


def _model(activation="ReLU", cond_mlp_dims=None, mlp_dims=None, **kw):
    actor = DiffusionMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, time_dim=16,
        mlp_dims=mlp_dims or [64, 64, 64], activation_type=activation,
        residual_style=True, cond_mlp_dims=cond_mlp_dims,
        use_layernorm=kw.pop("use_layernorm", False),
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
    K_total = model.n_sampling_steps
    base_steps = K_total - model.ft_denoising_steps
    t_all = np.asarray(model.t_schedule())
    eta_value = model._eta_value(params, cond, deterministic)
    x = x0
    states = [x0]
    sample_actor = params.actor if use_base_policy else params.actor_ft
    for i, t in enumerate(t_all):
        actor = params.actor if i < base_steps else sample_actor
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


DDIM_K = 5


@pytest.mark.parametrize("with_eta", [False, True])
@pytest.mark.parametrize("deterministic", [False, True])
def test_fused_chain_matches_scan_ddim(with_eta, deterministic):
    """DDIM path: the ε-recompute-after-clip update folded into the
    mu1/mu2 coefficient form must match the per-step reference math, with
    η = 0 (no module) and with a learnable EtaFixed scalar."""
    from dppo_tpu.diffusion.eta import EtaFixed

    eta = EtaFixed(base_eta=0.7, min_eta=0.1, max_eta=1.0) if with_eta else None
    model = _model(
        ft=3,
        use_ddim=True,
        ddim_steps=DDIM_K,
        eta=eta,
        learn_eta=with_eta,
    )
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, Do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft)
    )
    sampler = FusedChainSampler(model)
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, Ta * Da))
    noise = jnp.clip(
        jax.random.normal(rng_n, (DDIM_K, B, Ta * Da)), -3, 3
    )

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=deterministic)

    ref_chain = _reference_chain_with_noise(
        model, params, cond,
        x0.reshape(B, Ta, Da),
        noise.reshape(DDIM_K, B, Ta, Da),
        deterministic,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories), np.asarray(ref_chain[-1]),
        rtol=2e-4, atol=2e-5,
    )
    expected_rec = jnp.swapaxes(ref_chain[DDIM_K - 3 :], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-5
    )


def test_fused_rejects_unsupported_ddim():
    m = _model(ft=3, use_ddim=True, ddim_steps=DDIM_K, eps_clip_value=1.0)
    with pytest.raises(AssertionError):
        FusedChainSampler(m)


def test_fused_rejects_unsupported_network():
    """Architectures the kernel does not implement must raise at
    construction — never silently compute the wrong function."""
    with pytest.raises(AssertionError):
        FusedChainSampler(_model(use_layernorm=True))
    with pytest.raises(Exception):
        # even-length trunk: ResidualMLP itself rejects it at init
        m = _model(mlp_dims=[32, 32])
        m.init_vpg_params(
            jax.random.key(0),
            {"state": jnp.zeros((2, 1, Do), jnp.float32)},
        )
        FusedChainSampler(m)
    with pytest.raises(AssertionError):
        FusedChainSampler(_model(mlp_dims=[32, 48, 32]))  # unequal widths
    with pytest.raises(ValueError):
        FusedChainSampler(_model(activation="GELU"))


@pytest.mark.parametrize("depth", [5, 7])
def test_fused_chain_matches_scan_deeper_trunks(depth):
    """Arbitrary-depth residual trunks (mlp_dims [W]*5, [W]*7 -> 2, 3
    stacked residual blocks unrolled inside the kernel) stay bit-exact
    against the scan sampler."""
    model = _model(ft=4, mlp_dims=[48] * depth)
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, Do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft)
    )
    sampler = FusedChainSampler(model)
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, Ta * Da))
    noise = jnp.clip(jax.random.normal(rng_n, (K, B, Ta * Da)), -3, 3)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=False)

    ref_chain = _reference_chain_with_noise(
        model, params, cond,
        x0.reshape(B, Ta, Da),
        noise.reshape(K, B, Ta, Da),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories),
        np.asarray(ref_chain[-1]),
        rtol=2e-4,
        atol=2e-5,
    )
    expected_rec = jnp.swapaxes(ref_chain[K - 4 :], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize(
    "activation,cond_mlp_dims",
    [("Mish", None), ("ReLU", [24, 24]), ("Mish", [24, 24])],
)
def test_fused_chain_matches_scan_mish_cond_mlp(activation, cond_mlp_dims):
    """Mish trunk activation and/or a cond MLP (the d3il/robomimic state
    denoiser shapes): fused must still match the scan math. The cond-MLP
    state embedding is precomputed per actor outside the kernel."""
    model = _model(activation=activation, cond_mlp_dims=cond_mlp_dims, ft=K_ft)
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, Do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft)
    )
    sampler = FusedChainSampler(model)
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, Ta * Da))
    noise = jnp.clip(jax.random.normal(rng_n, (K, B, Ta * Da)), -3, 3)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=False)

    ref_chain = _reference_chain_with_noise(
        model, params, cond,
        x0.reshape(B, Ta, Da),
        noise.reshape(K, B, Ta, Da),
        deterministic=False,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories), np.asarray(ref_chain[-1]),
        rtol=2e-4, atol=2e-5,
    )
    expected_rec = jnp.swapaxes(ref_chain[K - K_ft :], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-5
    )


def _eta_module(kind):
    from dppo_tpu.diffusion.eta import EtaAction, EtaState, EtaStateAction

    if kind == "action":
        return EtaAction(action_dim=Da, base_eta=0.6, min_eta=0.1, max_eta=1.0)
    if kind == "state":
        return EtaState(input_dim=Do, mlp_dims=[8], out_dim=1)
    return EtaStateAction(input_dim=Do, mlp_dims=[8], action_dim=Da)


@pytest.mark.parametrize("kind", ["action", "state", "state_action"])
@pytest.mark.parametrize("deterministic", [False, True])
def test_fused_chain_matches_scan_ddim_per_sample_eta(kind, deterministic):
    """Per-sample η modules take the plane-coefficient kernel; it must match
    the per-step scan math exactly. The zero-initialised η heads are
    perturbed so η actually varies across the batch/action dims."""
    model = _model(
        ft=3, use_ddim=True, ddim_steps=DDIM_K,
        eta=_eta_module(kind), learn_eta=True,
    )
    cond = {"state": jax.random.normal(jax.random.key(0), (B, 1, Do))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x * 1.1, params.actor_ft),
        eta=jax.tree_util.tree_map(
            lambda x: x
            + 0.3 * jax.random.normal(jax.random.key(7), x.shape),
            params.eta,
        ),
    )
    eta_val = model.eta_module.apply(params.eta, cond)
    assert float(jnp.std(eta_val)) > 0 or kind == "action"
    sampler = FusedChainSampler(model)
    assert sampler.per_sample_eta
    rng = jax.random.key(2)
    rng_x, rng_n = jax.random.split(rng)
    x0 = jax.random.normal(rng_x, (B, Ta * Da))
    noise = jnp.clip(
        jax.random.normal(rng_n, (DDIM_K, B, Ta * Da)), -3, 3
    )

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = sampler(params, cond, rng, deterministic=deterministic)

    ref_chain = _reference_chain_with_noise(
        model, params, cond,
        x0.reshape(B, Ta, Da),
        noise.reshape(DDIM_K, B, Ta, Da),
        deterministic,
    )
    np.testing.assert_allclose(
        np.asarray(out.trajectories), np.asarray(ref_chain[-1]),
        rtol=2e-4, atol=2e-5,
    )
    expected_rec = jnp.swapaxes(ref_chain[DDIM_K - 3 :], 0, 1)
    np.testing.assert_allclose(
        np.asarray(out.chains), np.asarray(expected_rec), rtol=2e-4, atol=2e-5
    )
