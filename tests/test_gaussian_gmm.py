"""Tests for Gaussian/GMM policy models and their PPO fine-tuning loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.models.gaussian import GaussianModel, normal_logprob
from dppo_tpu.models.gaussian_ppo import PPOGaussian
from dppo_tpu.models.gmm import GMMModel, gmm_log_prob
from dppo_tpu.models.gmm_ppo import PPOGMM
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.gaussian_mlp import GaussianMLP
from dppo_tpu.nets.gmm_mlp import GMMMLP

B, Ta, Da, Do, To = 6, 2, 3, 5, 1


def _cond(seed=0, n=B):
    return {"state": jax.random.normal(jax.random.key(seed), (n, To, Do))}


def test_gaussian_mlp_shapes_and_fixed_std():
    net = GaussianMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[32, 32],
        fixed_std=0.2,
    )
    params = net.init(jax.random.key(0), _cond())
    mean, scale = net.apply(params, _cond())
    assert mean.shape == (B, Ta * Da) and scale.shape == (B, Ta * Da)
    np.testing.assert_allclose(scale, 0.2)
    assert np.all(np.abs(mean) <= 1.0)  # tanh squashed


def test_gaussian_mlp_learned_std_bounds():
    net = GaussianMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[32, 32],
        std_min=0.05, std_max=0.5,
    )
    params = net.init(jax.random.key(0), _cond())
    _, scale = net.apply(params, _cond())
    assert np.all(scale >= 0.05 - 1e-6) and np.all(scale <= 0.5 + 1e-6)


def test_gaussian_model_logprob_golden():
    net = GaussianMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[32, 32],
        fixed_std=0.3,
    )
    model = GaussianModel(network=net, horizon_steps=Ta)
    params = model.init_params(jax.random.key(0), _cond())
    act, logprob = model.forward(
        params, _cond(), jax.random.key(1), get_logprob=True
    )
    assert act.shape == (B, Ta, Da)
    mean, scale = model.forward_train(params, _cond())
    expected = normal_logprob(act.reshape(B, -1), mean, scale).sum(-1)
    np.testing.assert_allclose(np.asarray(logprob), np.asarray(expected), rtol=1e-5)


def test_gaussian_bc_loss_trains():
    import optax

    net = GaussianMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[64, 64]
    )
    model = GaussianModel(network=net, horizon_steps=Ta)
    cond = _cond(n=64)
    target = jnp.tile(jnp.asarray([[0.5, -0.3, 0.1]]), (64, Ta, 1))
    params = model.init_params(jax.random.key(0), cond)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.loss(p, target, cond, 0.0), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_gmm_log_prob_single_mode_equals_gaussian():
    """With one mode, GMM logprob == independent Gaussian logprob."""
    x = jax.random.normal(jax.random.key(0), (B, Ta * Da))
    means = jax.random.normal(jax.random.key(1), (B, 1, Ta * Da))
    scales = 0.5 * jnp.ones((B, 1, Ta * Da))
    logits = jnp.zeros((B, 1))
    lp = gmm_log_prob(x, means, scales, logits)
    expected = normal_logprob(x, means[:, 0], scales[:, 0]).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(expected), rtol=1e-5)


def test_gmm_model_sample_shapes():
    net = GMMMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[32, 32],
        num_modes=3,
    )
    model = GMMModel(network=net, horizon_steps=Ta)
    params = model.init_params(jax.random.key(0), _cond())
    out = model.forward(params, _cond(), jax.random.key(1))
    assert out.shape == (B, Ta, Da)
    loss, info = model.loss(params, out, _cond())
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("cls,netcls", [(PPOGaussian, GaussianMLP), (PPOGMM, GMMMLP)])
def test_ppo_loss_unit_ratio(cls, netcls):
    net_kwargs = dict(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do, mlp_dims=[32, 32]
    )
    if netcls is GMMMLP:
        net_kwargs["num_modes"] = 2
    actor = netcls(**net_kwargs)
    critic = CriticObs(cond_dim=Do, mlp_dims=[32, 32])
    model = cls(
        clip_ploss_coef=0.1, actor=actor, critic=critic, horizon_steps=Ta
    )
    params = model.init_vpg_params(jax.random.key(0), _cond())
    actions = model.sample(params, _cond(), jax.random.key(1))
    oldlogprobs, _, _ = model.get_logprobs(params, _cond(), actions)
    out = model.loss(
        params,
        _cond(),
        actions,
        jnp.ones((B,)),
        jnp.zeros((B,)),
        jnp.ones((B,)),
        oldlogprobs,
    )
    pg, ent, v, clipfrac, approx_kl, ratio, bc, std = out
    assert abs(float(ratio) - 1.0) < 1e-4
    assert abs(float(approx_kl)) < 1e-7
