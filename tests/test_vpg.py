"""Tests for the VPG/PPO diffusion fine-tuning machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.ppo import PPODiffusion
from dppo_tpu.diffusion.vpg import VPGDiffusion, tree_select
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP

B, Ta, Da, Do, To, K, K_ft = 6, 4, 3, 11, 1, 10, 4


def _make(cls=VPGDiffusion, **kw):
    actor = DiffusionMLP(
        action_dim=Da,
        horizon_steps=Ta,
        cond_dim=Do * To,
        time_dim=8,
        mlp_dims=[32, 32, 32],
        activation_type="ReLU",
        residual_style=True,
    )
    critic = CriticObs(cond_dim=Do * To, mlp_dims=[32, 32, 32], residual_style=True)
    return cls(
        actor=actor,
        critic=critic,
        ft_denoising_steps=K_ft,
        horizon_steps=Ta,
        obs_dim=Do,
        action_dim=Da,
        denoising_steps=K,
        **kw,
    )


def _cond(n=B, seed=0):
    return {"state": jax.random.normal(jax.random.key(seed), (n, To, Do))}


def test_tree_select():
    a = {"x": jnp.zeros(3), "y": jnp.ones((2, 2))}
    b = {"x": jnp.ones(3), "y": 2 * jnp.ones((2, 2))}
    sel = tree_select(jnp.asarray(True), a, b)
    np.testing.assert_allclose(sel["x"], 0.0)
    sel = tree_select(jnp.asarray(False), a, b)
    np.testing.assert_allclose(sel["y"], 2.0)


def test_chain_shapes():
    model = _make()
    params = model.init_vpg_params(jax.random.key(0), _cond())
    out = jax.jit(
        lambda p, c, r: model.sample(p, c, r, return_chain=True)
    )(params, _cond(), jax.random.key(1))
    assert out.trajectories.shape == (B, Ta, Da)
    assert out.chains.shape == (B, K_ft + 1, Ta, Da)
    # last chain entry is the final action
    np.testing.assert_allclose(out.chains[:, -1], out.trajectories)


def test_chain_full_ft_includes_initial_noise():
    model = _make(ft_denoising_steps=K) if False else None
    actor = DiffusionMLP(
        action_dim=Da, horizon_steps=Ta, cond_dim=Do * To, time_dim=8,
        mlp_dims=[32, 32, 32], activation_type="ReLU", residual_style=True,
    )
    critic = CriticObs(cond_dim=Do * To, mlp_dims=[32, 32, 32], residual_style=True)
    model = VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=K,
        horizon_steps=Ta, obs_dim=Do, action_dim=Da, denoising_steps=K,
    )
    params = model.init_vpg_params(jax.random.key(0), _cond())
    out = model.sample(params, _cond(), jax.random.key(1), return_chain=True)
    assert out.chains.shape == (B, K + 1, Ta, Da)


def test_base_vs_ft_actor_dispatch():
    """Perturbing actor_ft must change the sample; perturbing the base actor
    only affects the early (non-recorded) steps, so with ft < K the final
    action changes through the handoff state as well — instead verify the
    use_base_policy flag ignores actor_ft entirely."""
    model = _make()
    params = model.init_vpg_params(jax.random.key(0), _cond())
    rng = jax.random.key(5)
    base_out = model.sample(params, _cond(), rng, use_base_policy=True)
    pert = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x + 0.5, params.actor_ft)
    )
    base_out2 = model.sample(pert, _cond(), rng, use_base_policy=True)
    np.testing.assert_allclose(base_out.trajectories, base_out2.trajectories)
    ft_out = model.sample(pert, _cond(), rng, use_base_policy=False)
    assert not np.allclose(base_out.trajectories, ft_out.trajectories)


def test_logprob_golden():
    """get_logprobs must equal a hand-built Gaussian logpdf of transitions."""
    model = _make(min_logprob_denoising_std=0.1)
    params = model.init_vpg_params(jax.random.key(0), _cond())
    cond = _cond()
    out = model.sample(params, cond, jax.random.key(2), return_chain=True)
    logp = model.get_logprobs(params, cond, out.chains)
    assert logp.shape == (B * K_ft, Ta, Da)

    # manual recomputation for one (b, k) pair
    b, k = 2, 1
    t = K_ft - 1 - k  # DDPM: transitions use t = ft-1 ... 0
    x_prev = out.chains[b, k][None]
    x_next = out.chains[b, k + 1][None]
    cond_b = {"state": cond["state"][b][None]}
    mean, logvar, _ = model.p_mean_var_ft(
        params.actor_ft, x_prev, jnp.full((1,), t), cond_b
    )
    std = jnp.clip(jnp.exp(0.5 * logvar), 0.1, None)
    expected = (
        -0.5 * ((x_next - mean) / std) ** 2
        - jnp.log(std)
        - 0.5 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(
        np.asarray(logp[b * K_ft + k]), np.asarray(expected[0]), rtol=1e-4, atol=1e-5
    )


def test_logprobs_subsample_matches_full():
    model = _make()
    params = model.init_vpg_params(jax.random.key(0), _cond())
    cond = _cond()
    out = model.sample(params, cond, jax.random.key(3), return_chain=True)
    full = model.get_logprobs(params, cond, out.chains).reshape(B, K_ft, Ta, Da)
    inds = jnp.array([0, 3, 1, 2, 0, 3])
    sub = model.get_logprobs_subsample(
        params,
        cond,
        out.chains[jnp.arange(B), inds],
        out.chains[jnp.arange(B), inds + 1],
        inds,
    )
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full[jnp.arange(B), inds]), rtol=1e-4, atol=1e-5
    )


def test_ppo_loss_runs_and_grads():
    model = _make(
        cls=PPODiffusion,
        gamma_denoising=0.99,
        clip_ploss_coef=0.01,
        clip_ploss_coef_base=0.01,
        clip_ploss_coef_rate=3,
        randn_clip_value=3,
        min_sampling_denoising_std=0.1,
        min_logprob_denoising_std=0.1,
    )
    params = model.init_vpg_params(jax.random.key(0), _cond())
    cond = _cond()
    out = model.sample(params, cond, jax.random.key(3), return_chain=True)
    inds = jnp.array([0, 1, 2, 3, 0, 1])
    chains_prev = out.chains[jnp.arange(B), inds]
    chains_next = out.chains[jnp.arange(B), inds + 1]
    oldlogprobs = model.get_logprobs_subsample(
        params, cond, chains_prev, chains_next, inds
    )
    returns = jnp.ones((B,))
    values = jnp.zeros((B,))
    advantages = jnp.linspace(-1, 1, B)

    def total_loss(p):
        pg, ent, v, *_ = model.loss(
            p, cond, chains_prev, chains_next, inds, returns, values,
            advantages, oldlogprobs, reward_horizon=4,
        )
        return pg + 0.5 * v

    loss, grads = jax.value_and_grad(total_loss)(params)
    assert np.isfinite(loss)
    # gradient flows to actor_ft and critic, not to the frozen base actor
    g_ft = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads.actor_ft, 0.0
    )
    g_base = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads.actor, 0.0
    )
    g_critic = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads.critic, 0.0
    )
    assert g_ft > 0 and g_critic > 0
    assert g_base == 0.0


def test_identical_policies_give_unit_ratio():
    """With new == old params, approx_kl ~ 0 and ratio ~ 1."""
    model = _make(
        cls=PPODiffusion,
        gamma_denoising=0.99,
        clip_ploss_coef=0.01,
    )
    params = model.init_vpg_params(jax.random.key(0), _cond())
    cond = _cond()
    out = model.sample(params, cond, jax.random.key(3), return_chain=True)
    inds = jnp.zeros((B,), dtype=jnp.int32)
    chains_prev = out.chains[:, 0]
    chains_next = out.chains[:, 1]
    oldlogprobs = model.get_logprobs_subsample(
        params, cond, chains_prev, chains_next, inds
    )
    pg, ent, v, clipfrac, approx_kl, ratio, bc, eta = model.loss(
        params, cond, chains_prev, chains_next, inds,
        jnp.ones((B,)), jnp.zeros((B,)), jnp.ones((B,)), oldlogprobs,
    )
    assert abs(float(ratio) - 1.0) < 1e-5
    assert abs(float(approx_kl)) < 1e-8
    assert float(clipfrac) == 0.0


# ---------------------------------------------------- bf16 sampling option
def test_bf16_sampling_close_to_fp32():
    """sample_network_dtype=bfloat16 runs the denoiser in bf16 during
    sampling only: same rng stream, trajectories/chains close to the fp32
    path, log-prob evaluation still exact fp32."""
    m32 = _make()
    m16 = _make(sample_network_dtype="bfloat16")
    cond = _cond()
    params = m32.init_vpg_params(jax.random.key(0), cond)
    s32 = m32.sample(params, cond, jax.random.key(7), deterministic=False)
    s16 = m16.sample(params, cond, jax.random.key(7), deterministic=False)
    assert np.isfinite(np.asarray(s16.trajectories)).all()
    assert np.asarray(s16.trajectories).dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(s16.trajectories), np.asarray(s32.trajectories), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(s16.chains), np.asarray(s32.chains), atol=0.15
    )
    # non-sampling math is untouched: identical fp32 logprobs of a chain
    lp32 = m32.get_logprobs(params, cond, s32.chains)
    lp16 = m16.get_logprobs(params, cond, s32.chains)
    np.testing.assert_array_equal(np.asarray(lp32), np.asarray(lp16))


def test_bf16_rejects_bad_dtype_and_fused():
    import pytest

    with pytest.raises(ValueError, match="sample_network_dtype"):
        _make(sample_network_dtype="float16")
    from dppo_tpu.ops.pallas.fused_chain import FusedChainSampler

    m16 = _make(sample_network_dtype="bfloat16")
    with pytest.raises(AssertionError, match="fp32"):
        FusedChainSampler(m16)


def test_rl_checkpoint_warm_start(tmp_path):
    """network_path at a trained RL checkpoint (no "ema" key): actor,
    actor_ft, critic, eta load from the checkpoint instead of fresh init
    (parity: diffusion_vpg.py:92-98 non-strict load_state_dict)."""
    from dppo_tpu.utils.ckpt import save_checkpoint

    model = _make()
    params = model.init_vpg_params(jax.random.key(0), _cond())
    # perturb so ckpt trees differ from any fresh init
    trained = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x + 1.0, params.actor_ft),
        critic=jax.tree_util.tree_map(lambda x: x + 2.0, params.critic),
    )
    path = str(tmp_path / "state_7.pkl")
    save_checkpoint(path, {"itr": 7, "model": trained})

    model2 = _make(network_path=path)
    loaded = model2.init_vpg_params(jax.random.key(5), _cond())
    for name in ("actor", "actor_ft", "critic"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(trained, name)),
            jax.tree_util.tree_leaves(getattr(loaded, name)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pretrain ckpt (has "ema") keeps the old behavior: critic fresh
    save_checkpoint(
        str(tmp_path / "pre.pkl"),
        {"epoch": 1, "model": params.actor, "ema": trained.actor_ft},
    )
    model3 = _make(network_path=str(tmp_path / "pre.pkl"))
    loaded3 = model3.init_vpg_params(jax.random.key(5), _cond())
    for a, b in zip(
        jax.tree_util.tree_leaves(trained.actor_ft),
        jax.tree_util.tree_leaves(loaded3.actor),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # RL ckpt whose model is not a VPG tree -> actionable error
    save_checkpoint(str(tmp_path / "bad.pkl"), {"itr": 1, "model": {"x": 1}})
    model4 = _make(network_path=str(tmp_path / "bad.pkl"))
    try:
        model4.init_vpg_params(jax.random.key(0), _cond())
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "warm-start" in str(e)
