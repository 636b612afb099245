"""Tests for the diffusion core: sampler shapes/determinism, loss, and a
golden-value check of p_mean_var against a hand-computed DDPM posterior."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.diffusion.core import DiffusionModel
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from dppo_tpu.ops.schedule import cosine_beta_schedule

B, Ta, Da, Do, To, K = 4, 4, 3, 11, 1, 20


class LinearNoiseNet(nn.Module):
    """Deterministic analytic 'network' for golden tests: eps = 0.1*x."""

    @nn.compact
    def __call__(self, x, t, cond):
        dummy = self.param("w", nn.initializers.zeros, (1,))
        return 0.1 * x + 0.0 * dummy


def _model(net=None, **kw):
    kw.setdefault("denoising_steps", K)
    return DiffusionModel(
        network=net or DiffusionMLP(
            action_dim=Da,
            horizon_steps=Ta,
            cond_dim=Do * To,
            time_dim=16,
            mlp_dims=[64, 64, 64],
            activation_type="ReLU",
            residual_style=True,
        ),
        horizon_steps=Ta,
        obs_dim=Do,
        action_dim=Da,
        **kw,
    )


def _cond(rng=0):
    return {"state": jax.random.normal(jax.random.key(rng), (B, To, Do))}


def test_sampler_shapes_and_determinism():
    model = _model()
    params = model.init_params(jax.random.key(0), cond=_cond())
    rng = jax.random.key(42)
    s1 = jax.jit(lambda p, c, r: model.forward(p, c, r))(params, _cond(), rng)
    s2 = jax.jit(lambda p, c, r: model.forward(p, c, r))(params, _cond(), rng)
    assert s1.trajectories.shape == (B, Ta, Da)
    np.testing.assert_allclose(s1.trajectories, s2.trajectories)  # same key
    s3 = model.forward(params, _cond(), jax.random.key(43))
    assert not np.allclose(s1.trajectories, s3.trajectories)


def test_p_mean_var_golden_ddpm():
    """With eps = 0.1*x the posterior mean/var have a closed form."""
    model = _model(LinearNoiseNet(), denoised_clip_value=None)
    params = LinearNoiseNet().init(jax.random.key(0), jnp.zeros((B, Ta, Da)), 0, {})
    x = jax.random.normal(jax.random.key(1), (B, Ta, Da))
    t = 7
    mu, logvar = model.p_mean_var(
        params, x, jnp.full((B,), t), cond={}, index=None
    )
    betas = cosine_beta_schedule(K)
    acp = np.cumprod(1 - betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    eps = 0.1 * np.asarray(x)
    x_recon = np.sqrt(1 / acp[t]) * np.asarray(x) - np.sqrt(1 / acp[t] - 1) * eps
    mu_exp = (
        betas[t] * np.sqrt(acp_prev[t]) / (1 - acp[t]) * x_recon
        + (1 - acp_prev[t]) * np.sqrt(1 - betas[t]) / (1 - acp[t]) * np.asarray(x)
    )
    var_exp = betas[t] * (1 - acp_prev[t]) / (1 - acp[t])
    np.testing.assert_allclose(np.asarray(mu), mu_exp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logvar)[:, 0, 0], np.log(var_exp), rtol=1e-4
    )


def test_denoised_clip_applied():
    model = _model(LinearNoiseNet(), denoised_clip_value=1.0)
    params = LinearNoiseNet().init(jax.random.key(0), jnp.zeros((B, Ta, Da)), 0, {})
    x = 100.0 * jnp.ones((B, Ta, Da))  # x_recon would be huge without clipping
    t = K - 1
    mu, _ = model.p_mean_var(params, x, jnp.full((B,), t), cond={})
    betas = cosine_beta_schedule(K)
    acp = np.cumprod(1 - betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    mu_exp = (
        betas[t] * np.sqrt(acp_prev[t]) / (1 - acp[t]) * 1.0  # clipped x0
        + (1 - acp_prev[t]) * np.sqrt(1 - betas[t]) / (1 - acp[t]) * 100.0
    )
    np.testing.assert_allclose(np.asarray(mu), mu_exp, rtol=1e-4)


def test_ddim_sampler_deterministic_given_x0():
    model = _model(use_ddim=True, ddim_steps=5)
    params = model.init_params(jax.random.key(0), cond=_cond())
    rng = jax.random.key(7)
    out1 = model.forward(params, _cond(), rng).trajectories
    out2 = model.forward(params, _cond(), rng).trajectories
    np.testing.assert_allclose(out1, out2)
    assert out1.shape == (B, Ta, Da)


def test_bc_loss_decreases_under_training():
    import optax

    model = _model()
    cond = _cond()
    actions = 0.3 * jnp.ones((B * 8, Ta, Da))
    big_cond = {"state": jnp.tile(cond["state"], (8, 1, 1))}
    params = model.init_params(jax.random.key(0), cond=big_cond)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(model.loss)(params, rng, actions, big_cond)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(1)
    first = None
    for i in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = loss
    assert loss < first * 0.7, (first, loss)


def test_q_sample_endpoints():
    model = _model()
    x0 = jnp.ones((B, Ta, Da))
    noise = jnp.zeros_like(x0)
    out = model.q_sample(x0, jnp.zeros((B,), dtype=jnp.int32), noise)
    betas = cosine_beta_schedule(K)
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(1 - betas[0]), rtol=1e-5
    )
