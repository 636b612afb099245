"""Cross-framework golden parity, part 4: the off-policy loss families.

Oracle targets (reference file:line):
  - DQLDiffusion.loss_critic     diffusion_dql.py:43-72 (TD double-Q with a
    stochastic K-step next-action chain — injected matching noise)
  - DQLDiffusion.loss_actor      diffusion_dql.py:74-88 (differentiable
    chain + BC loss + randomly-picked normalized Q head — injected noise,
    t draws, and head pick)
  - SAC_Gaussian.loss_critic / loss_actor / loss_temperature
                                  rl/gaussian_sac.py:31-80 (tanh-squashed
    samples via intercepted torch.distributions.Normal sampling)
  - CriticObsAct double-Q forward common/critic.py:57-113

Together with parts 1-3 this pins every loss FORM the framework ships:
PPO surrogate, BC epsilon-MSE, reward/advantage-weighted regression, TD
double-Q with diffusion-chain actors, and entropy-regularized SAC.
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
    from dppo.model.diffusion.diffusion_dql import DQLDiffusion as TorchDQL
    from dppo.model.rl.gaussian_sac import SAC_Gaussian as TorchSAC
    from dppo.model.common.critic import CriticObsAct as TorchCriticObsAct
    from dppo.model.common.mlp_gaussian import Gaussian_MLP as TorchGaussianMLP
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.dql import DQLDiffusion, DQLParams
from dppo_tpu.models.gaussian_sac import SACGaussian, SACParams
from dppo_tpu.nets.critic import CriticObsAct
from dppo_tpu.nets.gaussian_mlp import GaussianMLP

from tests.test_reference_parity import (
    _copy_plain_mlp,
    _init_actor_params,
    _make_flax_actor,
    _make_torch_actor,
    copy_diffusion_mlp,
)
from tests.test_reference_parity_more import _copy_gaussian_mlp

OBS, ACT, TA, K = 11, 3, 4, 8


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _copy_critic_obs_act(flax_params, tnet):
    p = flax_params["params"]
    _copy_plain_mlp(p["MLP_0"], tnet.Q1)
    _copy_plain_mlp(p["MLP_1"], tnet.Q2)


def _make_critic_pair(seed):
    critic = CriticObsAct(
        cond_dim=OBS, mlp_dims=[32, 32], action_dim=ACT, action_steps=TA
    )
    cp = critic.init(
        jax.random.key(seed),
        {"state": jnp.zeros((2, 1, OBS))},
        jnp.zeros((2, TA, ACT)),
    )
    tcritic = TorchCriticObsAct(
        cond_dim=OBS + ACT * TA, mlp_dims=[32, 32], action_dim=0
    )
    # reference builds input dim as cond_dim + action_dim*action_steps
    # (critic.py:73); passing the combined dim with action_dim=0 keeps the
    # layer shapes identical to ours
    _copy_critic_obs_act(cp, tcritic)
    tcritic.eval()
    return critic, cp, tcritic


def test_critic_obs_act_forward():
    critic, cp, tcritic = _make_critic_pair(40)
    B = 6
    cond = {"state": jax.random.normal(jax.random.key(41), (B, 1, OBS))}
    act = jax.random.normal(jax.random.key(42), (B, TA, ACT))
    q1, q2 = critic.apply(cp, cond, act)
    with torch.no_grad():
        t1, t2 = tcritic({"state": _t(cond["state"])}, _t(act))
    np.testing.assert_allclose(np.asarray(q1), t1.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q2), t2.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# DQL
# ---------------------------------------------------------------------------

def _chain_draws(rng, B, n_steps):
    """Replicate DQLDiffusion._chain's internal rng sequence."""
    rng, xr = jax.random.split(rng)
    draws = [np.asarray(jax.random.normal(xr, (B, TA, ACT)))]
    for _ in range(n_steps):
        rng, nr = jax.random.split(rng)
        draws.append(np.asarray(jax.random.normal(nr, (B, TA, ACT))))
    return draws


def _feed(monkeypatch, seq):
    it = iter(seq)

    def fake_randn(*size, **kw):
        if size and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        return torch.from_numpy(np.asarray(next(it), np.float32))

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, **kw: torch.from_numpy(np.asarray(next(it), np.float32)),
    )


@pytest.fixture()
def dql_pair():
    base = _init_actor_params(43)
    critic, cp, tcritic = _make_critic_pair(44)
    kw = dict(
        horizon_steps=TA, obs_dim=OBS, action_dim=ACT, denoising_steps=K,
        randn_clip_value=3,
    )
    model = DQLDiffusion(actor=_make_flax_actor(), critic=critic, **kw)
    params = DQLParams(actor=base, critic=cp, critic_target=cp)
    tmodel = TorchDQL(
        actor=_make_torch_actor(), critic=tcritic, device="cpu", **kw
    )
    copy_diffusion_mlp(base, tmodel.actor)
    _copy_critic_obs_act(cp, tmodel.critic)
    _copy_critic_obs_act(cp, tmodel.critic_target)
    tmodel.eval()
    return model, params, tmodel


class TestDQLParity:
    def test_loss_critic_with_injected_chain(self, dql_pair, monkeypatch):
        model, params, tmodel = dql_pair
        B = 6
        r = jax.random.split(jax.random.key(45), 6)
        obs = {"state": jax.random.normal(r[0], (B, 1, OBS))}
        next_obs = {"state": jax.random.normal(r[1], (B, 1, OBS))}
        actions = jax.random.normal(r[2], (B, TA, ACT))
        rewards = jax.random.normal(r[3], (B,))
        terminated = (jax.random.uniform(r[4], (B,)) < 0.3).astype(jnp.float32)
        rng = r[5]
        ours = model.loss_critic(
            params.critic, params, obs, next_obs, actions, rewards,
            terminated, 0.99, rng,
        )
        _feed(monkeypatch, _chain_draws(rng, B, K))
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions),
                _t(rewards),
                _t(terminated),
                0.99,
            )
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)

    def test_loss_actor_with_injected_chain_bc_and_pick(
        self, dql_pair, monkeypatch
    ):
        model, params, tmodel = dql_pair
        B = 6
        r = jax.random.split(jax.random.key(46), 2)
        obs = {"state": jax.random.normal(r[0], (B, 1, OBS))}
        rng = r[1]
        ours = model.loss_actor(params.actor, params, obs, 0.7, TA, rng)

        # replicate the repo's split structure: (chain, bc, pick)
        rng_chain, rng_bc, rng_pick = jax.random.split(rng, 3)
        rng_t, rng_n = jax.random.split(rng_bc)
        t_bc = jax.random.randint(rng_t, (B,), 0, K)
        noise_bc = np.asarray(jax.random.normal(rng_n, (B, TA, ACT)))
        pick_first = bool(jax.random.uniform(rng_pick) > 0.5)
        # torch draw order: chain x0 + K step noises, then the BC noise
        _feed(monkeypatch, _chain_draws(rng_chain, B, K) + [noise_bc])
        monkeypatch.setattr(
            torch,
            "randint",
            lambda low, high, size, **kw: torch.from_numpy(
                np.asarray(t_bc, np.int64)
            ),
        )
        monkeypatch.setattr(
            np.random, "uniform", lambda *a, **kw: 0.9 if pick_first else 0.1
        )
        with torch.no_grad():
            theirs = tmodel.loss_actor({"state": _t(obs["state"])}, 0.7, TA)
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)


# ---------------------------------------------------------------------------
# SAC
# ---------------------------------------------------------------------------

def _make_sac_pair():
    head_kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        mlp_dims=[32, 32, 32],
        activation_type="ReLU",
        tanh_output=False,  # SAC squashes after sampling
        residual_style=False,
        std_max=5.0,
    )
    fnet = GaussianMLP(**head_kw)
    fp = fnet.init(jax.random.key(47), {"state": jnp.zeros((2, 1, OBS))})
    tnet = TorchGaussianMLP(**{**head_kw, "mlp_dims": list(head_kw["mlp_dims"])})
    _copy_gaussian_mlp(fp, tnet, learned_std=True)

    critic, cp, tcritic = _make_critic_pair(48)
    model = SACGaussian(
        actor=fnet, critic=critic, horizon_steps=TA, tanh_output=True,
        randn_clip_value=10,
    )
    params = SACParams(
        actor=fp, critic=cp, critic_target=cp, log_alpha=jnp.log(jnp.asarray(0.7))
    )
    tmodel = TorchSAC(
        actor=tnet, critic=tcritic, device="cpu", horizon_steps=TA,
        tanh_output=True, randn_clip_value=10,
    )
    _copy_critic_obs_act(cp, tmodel.target_critic)
    tmodel.eval()
    return model, params, tmodel


def _intercept_normal_sampling(monkeypatch, noise):
    """Route torch.distributions.Normal sampling through injected noise."""
    import torch.distributions as D

    def fake_sample(self, sample_shape=torch.Size()):
        return self.loc + self.scale * torch.from_numpy(
            np.asarray(noise, np.float32)
        )

    monkeypatch.setattr(D.Normal, "sample", fake_sample)
    monkeypatch.setattr(D.Normal, "rsample", fake_sample)


class TestSACParity:
    def _setup(self, seed, B=6):
        r = jax.random.split(jax.random.key(seed), 6)
        obs = {"state": jax.random.normal(r[0], (B, 1, OBS))}
        next_obs = {"state": jax.random.normal(r[1], (B, 1, OBS))}
        actions = jnp.tanh(jax.random.normal(r[2], (B, TA, ACT)))
        rewards = jax.random.normal(r[3], (B,))
        terminated = (jax.random.uniform(r[4], (B,)) < 0.3).astype(jnp.float32)
        return obs, next_obs, actions, rewards, terminated, r[5]

    def test_loss_critic(self, monkeypatch):
        model, params, tmodel = _make_sac_pair()
        obs, next_obs, actions, rewards, terminated, rng = self._setup(49)
        ours = model.loss_critic(
            params.critic, params, obs, next_obs, actions, rewards,
            terminated, 0.99, 0.7, rng,
        )
        # repo forward: noise = normal(rng, mean.shape) with mean (B, TA*ACT)
        noise = np.asarray(jax.random.normal(rng, (6, TA * ACT)))
        _intercept_normal_sampling(monkeypatch, noise)
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions),
                _t(rewards),
                _t(terminated),
                0.99,
                0.7,
            )
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)

    def test_loss_actor_and_temperature(self, monkeypatch):
        model, params, tmodel = _make_sac_pair()
        obs, _, _, _, _, rng = self._setup(50)
        ours_actor = model.loss_actor(params.actor, params, obs, 0.7, rng)
        ours_temp = model.loss_temperature(
            params.log_alpha, params, obs, -float(ACT * TA), rng
        )
        noise = np.asarray(jax.random.normal(rng, (6, TA * ACT)))
        _intercept_normal_sampling(monkeypatch, noise)
        with torch.no_grad():
            theirs_actor = tmodel.loss_actor({"state": _t(obs["state"])}, 0.7)
            theirs_temp = tmodel.loss_temperature(
                {"state": _t(obs["state"])},
                torch.exp(torch.log(torch.tensor(0.7))),
                -float(ACT * TA),
            )
        assert float(ours_actor) == pytest.approx(float(theirs_actor), rel=2e-3)
        assert float(ours_temp) == pytest.approx(float(theirs_temp), rel=2e-3)
