"""Cross-framework golden parity: the installed torch reference as oracle.

Every other "golden" test in this suite compares dppo_tpu against
hand-replicated formulas. These tests instead import the ACTUAL reference
implementation (`/root/reference/dppo`, torch CPU), load the SAME weights
into both frameworks (flax Dense kernel == torch Linear weight.T), feed
identical inputs — including injected matching noise draws for the
stochastic sampler chain — and compare outputs numerically.

Oracle targets (reference file:line):
  - schedule tables            diffusion.py:98-196 / sampling.py:10-26
  - DiffusionMLP forward       mlp_diffusion.py:174-248
  - CriticObs forward          common/critic.py:15-54
  - p_mean_var (base+ft)       diffusion_vpg.py:139-224, diffusion.py:200-259
  - full stochastic chain      diffusion_vpg.py:228-315
  - get_logprobs               diffusion_vpg.py:319-396
  - get_logprobs_subsample     diffusion_vpg.py:398-461
  - PPO loss + diagnostics     diffusion_ppo.py:57-199
"""

from __future__ import annotations

import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

try:
    from dppo.model.diffusion.mlp_diffusion import DiffusionMLP as TorchDiffusionMLP
    from dppo.model.diffusion.diffusion_vpg import VPGDiffusion as TorchVPGDiffusion
    from dppo.model.diffusion.diffusion_ppo import PPODiffusion as TorchPPODiffusion
    from dppo.model.common.critic import CriticObs as TorchCriticObs
except Exception as e:  # pragma: no cover - reference not importable
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.ppo import PPODiffusion
from dppo_tpu.diffusion.vpg import VPGDiffusion, VPGParams
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from dppo_tpu.ops import schedule

# hopper finetune operating point (cfg/gym/finetune/hopper-v2)
OBS, ACT, TA, K, K_FT = 11, 3, 4, 20, 10
MLP_DIMS = [64, 64, 64]  # smaller than 512 for test speed; same structure
CRITIC_DIMS = [32, 32, 32]


# ---------------------------------------------------------------------------
# weight transport: flax tree -> torch modules
# ---------------------------------------------------------------------------

def _set_linear(tlin, fl):
    with torch.no_grad():
        tlin.weight.copy_(torch.from_numpy(np.asarray(fl["kernel"]).T.copy()))
        tlin.bias.copy_(torch.from_numpy(np.asarray(fl["bias"]).copy()))


def _copy_plain_mlp(fl, tmod):
    """flax MLP params {Dense_i[, LayerNorm_i]} -> torch MLP.moduleList."""
    i = 0
    while f"Dense_{i}" in fl:
        _set_linear(tmod.moduleList[i].linear_1, fl[f"Dense_{i}"])
        if f"LayerNorm_{i}" in fl:
            ln = fl[f"LayerNorm_{i}"]
            with torch.no_grad():
                tmod.moduleList[i].norm_1.weight.copy_(
                    torch.from_numpy(np.asarray(ln["scale"]).copy())
                )
                tmod.moduleList[i].norm_1.bias.copy_(
                    torch.from_numpy(np.asarray(ln["bias"]).copy())
                )
        i += 1


def _copy_residual_mlp(fl, tmod):
    """flax ResidualMLP params -> torch ResidualMLP.layers."""
    _set_linear(tmod.layers[0], fl["Dense_0"])
    blocks = sorted(
        (k for k in fl if k.startswith("TwoLayerPreActivationResNetLinear")),
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    for j, key in enumerate(blocks):
        _set_linear(tmod.layers[1 + j].l1, fl[key]["Dense_0"])
        _set_linear(tmod.layers[1 + j].l2, fl[key]["Dense_1"])
    _set_linear(tmod.layers[1 + len(blocks)], fl["Dense_1"])


def copy_diffusion_mlp(flax_params, tnet):
    p = flax_params["params"]
    te = p["TimeEmbedding_0"]
    _set_linear(tnet.time_embedding[1], te["Dense_0"])
    _set_linear(tnet.time_embedding[3], te["Dense_1"])
    if hasattr(tnet, "cond_mlp"):
        _copy_plain_mlp(p["MLP_0"], tnet.cond_mlp)
    if "ResidualMLP_0" in p:
        _copy_residual_mlp(p["ResidualMLP_0"], tnet.mlp_mean)
    else:
        # without cond_mlp the body is MLP_0; with it, MLP_1
        body = "MLP_1" if hasattr(tnet, "cond_mlp") else "MLP_0"
        _copy_plain_mlp(p[body], tnet.mlp_mean)


def copy_critic_obs(flax_params, tnet):
    p = flax_params["params"]
    if "ResidualMLP_0" in p:
        _copy_residual_mlp(p["ResidualMLP_0"], tnet.Q1)
    else:
        _copy_plain_mlp(p["MLP_0"], tnet.Q1)


# ---------------------------------------------------------------------------
# matched model pairs
# ---------------------------------------------------------------------------

def _make_flax_actor():
    return DiffusionMLP(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        time_dim=16,
        mlp_dims=MLP_DIMS,
        activation_type="ReLU",
        residual_style=True,
    )


def _make_torch_actor():
    return TorchDiffusionMLP(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        time_dim=16,
        mlp_dims=list(MLP_DIMS),
        activation_type="ReLU",
        residual_style=True,
    )


def _init_actor_params(seed):
    net = _make_flax_actor()
    return net.init(
        jax.random.key(seed),
        jnp.zeros((2, TA, ACT)),
        jnp.zeros((2,), jnp.int32),
        {"state": jnp.zeros((2, 1, OBS))},
    )


@pytest.fixture(scope="module")
def matched_pair():
    """(repo PPODiffusion + VPGParams, torch PPODiffusion) with identical
    weights: base and ft actors deliberately DIFFERENT trees so boundary
    mistakes between the frozen/fine-tuned regimes cannot cancel out."""
    base_p = _init_actor_params(0)
    ft_p = _init_actor_params(1)
    critic = CriticObs(
        cond_dim=OBS, mlp_dims=CRITIC_DIMS, activation_type="Mish",
        residual_style=True,
    )
    critic_p = critic.init(jax.random.key(2), {"state": jnp.zeros((2, 1, OBS))})

    kw = dict(
        ft_denoising_steps=K_FT,
        min_sampling_denoising_std=0.1,
        min_logprob_denoising_std=0.1,
        horizon_steps=TA,
        obs_dim=OBS,
        action_dim=ACT,
        denoising_steps=K,
        randn_clip_value=3,
        denoised_clip_value=1.0,
    )
    ppo_kw = dict(
        gamma_denoising=0.99,
        clip_ploss_coef=0.01,
        clip_ploss_coef_base=0.01,
        clip_ploss_coef_rate=3,
    )
    model = PPODiffusion(
        actor=_make_flax_actor(),
        critic=critic,
        eta=None,
        **ppo_kw,
        **kw,
    )
    params = VPGParams(actor=base_p, actor_ft=ft_p, critic=critic_p, eta=None)

    tactor = _make_torch_actor()
    tcritic = TorchCriticObs(
        cond_dim=OBS, mlp_dims=list(CRITIC_DIMS), activation_type="Mish",
        residual_style=True,
    )
    tmodel = TorchPPODiffusion(
        actor=tactor,
        critic=tcritic,
        device="cpu",
        **ppo_kw,
        **kw,
    )
    copy_diffusion_mlp(base_p, tmodel.actor)
    copy_diffusion_mlp(ft_p, tmodel.actor_ft)
    copy_critic_obs(critic_p, tmodel.critic)
    tmodel.eval()
    return model, params, tmodel


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _cond(seed, B):
    state = jax.random.normal(jax.random.key(seed), (B, 1, OBS))
    return {"state": state}, {"state": _t(state)}


# ---------------------------------------------------------------------------
# (a) schedule tables
# ---------------------------------------------------------------------------

class TestScheduleTables:
    def test_ddpm_tables_match_reference(self, matched_pair):
        _, _, tmodel = matched_pair
        tables = schedule.make_ddpm_tables(K)
        for ours, theirs in [
            (tables.betas, tmodel.betas),
            (tables.alphas_cumprod, tmodel.alphas_cumprod),
            (tables.alphas_cumprod_prev, tmodel.alphas_cumprod_prev),
            (tables.sqrt_alphas_cumprod, tmodel.sqrt_alphas_cumprod),
            (
                tables.sqrt_one_minus_alphas_cumprod,
                tmodel.sqrt_one_minus_alphas_cumprod,
            ),
            (
                tables.sqrt_recip_alphas_cumprod,
                tmodel.sqrt_recip_alphas_cumprod,
            ),
            (
                tables.sqrt_recipm1_alphas_cumprod,
                tmodel.sqrt_recipm1_alphas_cumprod,
            ),
            (tables.ddpm_var, tmodel.ddpm_var),
            (tables.ddpm_logvar_clipped, tmodel.ddpm_logvar_clipped),
            (tables.ddpm_mu_coef1, tmodel.ddpm_mu_coef1),
            (tables.ddpm_mu_coef2, tmodel.ddpm_mu_coef2),
        ]:
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-7
            )

    def test_ddim_tables_match_reference(self):
        tactor = _make_torch_actor()
        tcritic = TorchCriticObs(cond_dim=OBS, mlp_dims=[32, 32])
        tmodel = TorchVPGDiffusion(
            actor=tactor,
            critic=tcritic,
            ft_denoising_steps=5,
            device="cpu",
            horizon_steps=TA,
            obs_dim=OBS,
            action_dim=ACT,
            denoising_steps=K,
            use_ddim=True,
            ddim_steps=10,
        )
        tables = schedule.make_ddim_tables(K, 10)
        # the reference keeps tables in ascending-t order and flips at
        # sampling time (diffusion.py:188-196 flip); ours are pre-flipped
        np.testing.assert_allclose(
            np.asarray(tables.t), tmodel.ddim_t.numpy(), rtol=0, atol=0
        )
        np.testing.assert_allclose(
            np.asarray(tables.alphas), tmodel.ddim_alphas.numpy(), rtol=1e-6,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tables.alphas_prev),
            tmodel.ddim_alphas_prev.numpy(),
            rtol=1e-6,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tables.sqrt_one_minus_alphas),
            tmodel.ddim_sqrt_one_minus_alphas.numpy(),
            rtol=1e-6,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tables.sigmas), tmodel.ddim_sigmas.numpy(), atol=1e-7
        )


# ---------------------------------------------------------------------------
# (b) network forwards
# ---------------------------------------------------------------------------

class TestNetworkForward:
    def test_diffusion_mlp_forward(self, matched_pair):
        model, params, tmodel = matched_pair
        B = 7
        rngs = jax.random.split(jax.random.key(3), 3)
        x = jax.random.normal(rngs[0], (B, TA, ACT))
        t = jax.random.randint(rngs[1], (B,), 0, K)
        cond_j = {"state": jax.random.normal(rngs[2], (B, 1, OBS))}
        ours = model.network.apply(params.actor, x, t, cond_j)
        with torch.no_grad():
            theirs = tmodel.actor(
                _t(x), torch.from_numpy(np.asarray(t)), cond={"state": _t(cond_j["state"])}
            )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_critic_forward(self, matched_pair):
        model, params, tmodel = matched_pair
        cond_j, cond_t = _cond(4, 9)
        ours = model.critic_value(params, cond_j)
        with torch.no_grad():
            theirs = tmodel.critic(cond_t).view(-1)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# (c) posterior p_mean_var in both regimes
# ---------------------------------------------------------------------------

class TestPMeanVar:
    @pytest.mark.parametrize("t_scalar", [19, 12, 10, 9, 4, 0])
    def test_p_mean_var_matches_at_timestep(self, matched_pair, t_scalar):
        model, params, tmodel = matched_pair
        B = 6
        x = jax.random.normal(jax.random.key(10 + t_scalar), (B, TA, ACT))
        cond_j, cond_t = _cond(20 + t_scalar, B)
        t_b = jnp.full((B,), t_scalar, jnp.int32)
        # repo rule == reference rule (diffusion_vpg.py:150-155):
        # DDPM fine-tuned regime iff t < ft_denoising_steps
        tree = params.actor_ft if t_scalar < K_FT else params.actor
        mu_j, logvar_j, _ = model.p_mean_var_ft(tree, x, t_b, cond_j)
        with torch.no_grad():
            mu_t, logvar_t, _ = tmodel.p_mean_var(
                x=_t(x), t=torch.full((B,), t_scalar), cond=cond_t
            )
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.numpy(), rtol=1e-4, atol=1e-5
        )
        lv_j = np.broadcast_to(np.asarray(logvar_j), mu_t.shape)
        lv_t = np.broadcast_to(logvar_t.numpy(), mu_t.shape)
        np.testing.assert_allclose(lv_j, lv_t, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# (d) full stochastic sampler chain with injected matching noise
# ---------------------------------------------------------------------------

def _repo_noise_sequence(rng, B):
    """Replicate the exact rng split sequence inside VPGDiffusion.sample:
    rng -> (rng', xr) for x0, then per step (carried through both scans)
    rng' -> (rng'', nr)."""
    rng, xr = jax.random.split(rng)
    draws = [np.asarray(jax.random.normal(xr, (B, TA, ACT)))]
    for _ in range(K):
        rng, nr = jax.random.split(rng)
        draws.append(np.asarray(jax.random.normal(nr, (B, TA, ACT))))
    return draws


class TestSamplerChain:
    @pytest.mark.parametrize("deterministic", [False, True])
    def test_full_chain_matches_with_injected_noise(
        self, matched_pair, monkeypatch, deterministic
    ):
        model, params, tmodel = matched_pair
        B = 5
        rng = jax.random.key(77)
        cond_j, cond_t = _cond(78, B)

        sample = jax.jit(
            lambda p, c, r: model.sample(
                p, c, r, deterministic=deterministic, return_chain=True
            )
        )(params, cond_j, rng)

        draws = iter(_repo_noise_sequence(rng, B))

        def fake_randn(*size, **kw):
            if size and isinstance(size[0], (tuple, torch.Size)):
                size = tuple(size[0])
            out = torch.from_numpy(np.asarray(next(draws), np.float32))
            assert tuple(out.shape) == tuple(size)
            return out

        def fake_randn_like(t, **kw):
            return torch.from_numpy(np.asarray(next(draws), np.float32))

        monkeypatch.setattr(torch, "randn", fake_randn)
        monkeypatch.setattr(torch, "randn_like", fake_randn_like)
        with torch.no_grad():
            theirs = tmodel.forward(
                cond_t, deterministic=deterministic, return_chain=True
            )

        np.testing.assert_allclose(
            np.asarray(sample.trajectories),
            theirs.trajectories.numpy(),
            rtol=2e-4,
            atol=2e-4,
        )
        assert sample.chains.shape == tuple(theirs.chains.shape)
        np.testing.assert_allclose(
            np.asarray(sample.chains),
            theirs.chains.numpy(),
            rtol=2e-4,
            atol=2e-4,
        )


# ---------------------------------------------------------------------------
# (e) chain log-probabilities
# ---------------------------------------------------------------------------

class TestLogprobs:
    def test_get_logprobs_full_chain(self, matched_pair):
        model, params, tmodel = matched_pair
        B = 6
        chains = jax.random.normal(
            jax.random.key(30), (B, K_FT + 1, TA, ACT)
        )
        cond_j, cond_t = _cond(31, B)
        ours = model.get_logprobs(params, cond_j, chains)
        with torch.no_grad():
            theirs = tmodel.get_logprobs(cond_t, _t(chains))
        assert np.asarray(ours).shape == tuple(theirs.shape)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-4
        )

    def test_get_logprobs_subsample(self, matched_pair):
        model, params, tmodel = matched_pair
        B = 16
        r = jax.random.split(jax.random.key(40), 4)
        prev = jax.random.normal(r[0], (B, TA, ACT))
        nxt = jax.random.normal(r[1], (B, TA, ACT))
        inds = jax.random.randint(r[2], (B,), 0, K_FT)
        cond_j, cond_t = _cond(41, B)
        ours, eta_j = model.get_logprobs_subsample(
            params, cond_j, prev, nxt, inds, get_ent=True
        )
        with torch.no_grad():
            theirs, eta_t = tmodel.get_logprobs_subsample(
                cond_t,
                _t(prev),
                _t(nxt),
                torch.from_numpy(np.asarray(inds)),
                get_ent=True,
            )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(eta_j), eta_t.numpy(), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# (f) the PPO loss and all its diagnostics
# ---------------------------------------------------------------------------

class TestPPOLoss:
    def test_loss_and_diagnostics_match(self, matched_pair):
        model, params, tmodel = matched_pair
        B = 32
        r = jax.random.split(jax.random.key(50), 8)
        prev = jax.random.normal(r[0], (B, TA, ACT))
        nxt = prev + 0.05 * jax.random.normal(r[1], (B, TA, ACT))
        inds = jax.random.randint(r[2], (B,), 0, K_FT)
        returns = jax.random.normal(r[3], (B,))
        oldvalues = jax.random.normal(r[4], (B,))
        advantages = jax.random.normal(r[5], (B,))
        oldlogprobs = 0.3 * jax.random.normal(r[6], (B, TA, ACT))
        cond_j, cond_t = _cond(51, B)

        ours = model.loss(
            params,
            cond_j,
            prev,
            nxt,
            inds,
            returns,
            oldvalues,
            advantages,
            oldlogprobs,
            use_bc_loss=False,
            reward_horizon=TA,
        )
        with torch.no_grad():
            theirs = tmodel.loss(
                cond_t,
                _t(prev),
                _t(nxt),
                torch.from_numpy(np.asarray(inds)),
                _t(returns),
                _t(oldvalues),
                _t(advantages),
                _t(oldlogprobs),
                use_bc_loss=False,
                reward_horizon=TA,
            )
        names = [
            "pg_loss",
            "entropy_loss",
            "v_loss",
            "clipfrac",
            "approx_kl",
            "ratio",
            "bc_loss",
            "eta",
        ]
        for name, o, t_val in zip(names, ours, theirs):
            o = float(o)
            t_val = float(t_val) if not torch.is_tensor(t_val) else float(t_val)
            assert o == pytest.approx(t_val, rel=2e-3, abs=2e-4), (
                f"{name}: repo {o} vs reference {t_val}"
            )
