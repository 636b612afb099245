"""Cross-framework golden parity, part 6: Cal-QL, RLPD, IBRL.

Oracle targets (reference file:line):
  - CalQL_Gaussian loss_critic (max-backup over cql_n_actions sampled next
    actions) / loss_actor / loss_temperature    rl/gaussian_calql.py:56-200
  - RLPD_Gaussian ensemble critic/actor/temperature losses (random
    two-member target min, stacked-module vmap)  rl/gaussian_rlpd.py:62-125
  - IBRL_Gaussian critic (max of BC vs RL bootstrap) and min-ensemble
    actor losses                                  rl/gaussian_ibrl.py:68-127

Sampling is aligned by intercepting torch.distributions.Normal and
torch.randperm with the repo's exact jax draws.

DOCUMENTED REFERENCE QUIRK (pinned below): in the Cal-QL CQL penalty the
reference subtracts a (B,) log-prob from a (B,1) calibrated Q
(`gaussian_calql.py:144-147`), silently broadcasting the importance-sample
set to (B, B+...) before the logsumexp; the repo follows CQL's published
(B, n_rand+2) form. The oracle comparison therefore runs the critic loss
at cql_min_q_weight=0 (TD + max-backup part, exact) and separately pins
that the penalty terms really do differ under the reference's shapes.
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
    from dppo.model.rl.gaussian_calql import CalQL_Gaussian as TorchCalQL
    from dppo.model.rl.gaussian_rlpd import RLPD_Gaussian as TorchRLPD
    from dppo.model.rl.gaussian_ibrl import IBRL_Gaussian as TorchIBRL
    from dppo.model.common.critic import CriticObsAct as TorchCriticObsAct
    from dppo.model.common.mlp_gaussian import Gaussian_MLP as TorchGaussianMLP
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.models.gaussian_calql import CalQLGaussian, CalQLParams
from dppo_tpu.models.gaussian_ibrl import IBRLGaussian, IBRLParams
from dppo_tpu.models.gaussian_rlpd import RLPDGaussian, RLPDParams
from dppo_tpu.nets.critic import CriticObsAct
from dppo_tpu.nets.gaussian_mlp import GaussianMLP

from tests.test_reference_parity import _copy_plain_mlp
from tests.test_reference_parity_more import _copy_gaussian_mlp
from tests.test_reference_parity_offpolicy import (
    _copy_critic_obs_act,
    _make_critic_pair,
)

OBS, ACT, TA = 11, 3, 4
B = 6


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _make_actor_pair(seed, tanh_output=False):
    head_kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        mlp_dims=[32, 32, 32],
        activation_type="ReLU",
        tanh_output=tanh_output,
        residual_style=False,
        std_max=5.0,
    )
    fnet = GaussianMLP(**head_kw)
    fp = fnet.init(jax.random.key(seed), {"state": jnp.zeros((2, 1, OBS))})
    tnet = TorchGaussianMLP(
        **{**head_kw, "mlp_dims": list(head_kw["mlp_dims"])}
    )
    _copy_gaussian_mlp(fp, tnet, learned_std=True)
    return fnet, fp, tnet


def _intercept_normal_sequence(monkeypatch, noises):
    """Pop a fresh injected noise per Normal sample/rsample call."""
    import torch.distributions as D

    it = iter(noises)

    def fake_sample(self, sample_shape=torch.Size()):
        return self.loc + self.scale * torch.from_numpy(
            np.asarray(next(it), np.float32)
        )

    monkeypatch.setattr(D.Normal, "sample", fake_sample)
    monkeypatch.setattr(D.Normal, "rsample", fake_sample)


def _batch(seed):
    r = jax.random.split(jax.random.key(seed), 6)
    obs = {"state": jax.random.normal(r[0], (B, 1, OBS))}
    next_obs = {"state": jax.random.normal(r[1], (B, 1, OBS))}
    actions = jnp.tanh(jax.random.normal(r[2], (B, TA, ACT)))
    rewards = jax.random.normal(r[3], (B,))
    terminated = (jax.random.uniform(r[4], (B,)) < 0.3).astype(jnp.float32)
    return obs, next_obs, actions, rewards, terminated, r[5]


# ---------------------------------------------------------------------------
# Cal-QL
# ---------------------------------------------------------------------------

class TestCalQLParity:
    @pytest.fixture()
    def pair(self):
        fnet, fp, tnet = _make_actor_pair(80, tanh_output=False)
        critic, cp, tcritic = _make_critic_pair(81)
        kw = dict(horizon_steps=TA, tanh_output=True, randn_clip_value=10)
        cql_kw = dict(
            cql_min_q_weight=0.0, cql_n_actions=4,
        )
        model = CalQLGaussian(actor=fnet, critic=critic, **cql_kw, **kw)
        params = CalQLParams(
            actor=fp, critic=cp, critic_target=cp,
            log_alpha=jnp.log(jnp.asarray(0.5)),
        )
        tmodel = TorchCalQL(
            actor=tnet, critic=tcritic, device="cpu", **cql_kw, **kw
        )
        _copy_critic_obs_act(cp, tmodel.target_critic)
        tmodel.eval()
        return model, params, tmodel

    def test_loss_critic_td_and_max_backup(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, next_obs, actions, rewards, terminated, rng = _batch(82)
        S = model.cql_n_actions
        random_actions = jax.random.uniform(
            jax.random.key(83), (B, 5, TA, ACT), minval=-1, maxval=1
        )
        returns = jax.random.normal(jax.random.key(84), (B,))
        ours = model.loss_critic(
            params.critic, params, obs, next_obs, actions, random_actions,
            rewards, returns, terminated, 0.99, rng,
        )
        r_next, r_pi, r_pi_next = jax.random.split(rng, 3)
        noises = [
            np.asarray(jax.random.normal(r_next, (B * S, TA * ACT))),
            np.asarray(jax.random.normal(r_pi, (B, TA * ACT))),
            np.asarray(jax.random.normal(r_pi_next, (B, TA * ACT))),
        ]
        _intercept_normal_sequence(monkeypatch, noises)
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions),
                _t(random_actions),
                _t(rewards),
                _t(returns),
                _t(terminated),
                0.99,
            )
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)

    def test_reference_cql_penalty_broadcast_quirk(self, pair, monkeypatch):
        """Pin the quirk: with a nonzero penalty weight the reference's
        (B,1)-(B,) broadcast makes its importance set (B, n+2B), so the two
        frameworks legitimately differ — the repo follows CQL's published
        (B, n+2) form (models/gaussian_calql.py docstring)."""
        model, params, tmodel = pair
        model.cql_min_q_weight = 5.0
        tmodel.cql_min_q_weight = 5.0
        obs, next_obs, actions, rewards, terminated, rng = _batch(85)
        S = model.cql_n_actions
        random_actions = jax.random.uniform(
            jax.random.key(86), (B, 5, TA, ACT), minval=-1, maxval=1
        )
        returns = jax.random.normal(jax.random.key(87), (B,))
        ours = model.loss_critic(
            params.critic, params, obs, next_obs, actions, random_actions,
            rewards, returns, terminated, 0.99, rng,
        )
        r_next, r_pi, r_pi_next = jax.random.split(rng, 3)
        _intercept_normal_sequence(
            monkeypatch,
            [
                np.asarray(jax.random.normal(r_next, (B * S, TA * ACT))),
                np.asarray(jax.random.normal(r_pi, (B, TA * ACT))),
                np.asarray(jax.random.normal(r_pi_next, (B, TA * ACT))),
            ],
        )
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions),
                _t(random_actions),
                _t(rewards),
                _t(returns),
                _t(terminated),
                0.99,
            )
        assert np.isfinite(float(theirs))
        assert float(ours) != pytest.approx(float(theirs), rel=1e-3)

    def test_loss_actor_and_temperature(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, _, _, _, _, rng = _batch(88)
        ours_a = model.loss_actor(params.actor, params, obs, 0.5, rng)
        ours_t = model.loss_temperature(
            params.log_alpha, params, obs, -float(ACT * TA), rng
        )
        noise = np.asarray(jax.random.normal(rng, (B, TA * ACT)))
        _intercept_normal_sequence(monkeypatch, [noise, noise])
        with torch.no_grad():
            theirs_a = tmodel.loss_actor({"state": _t(obs["state"])}, 0.5)
            theirs_t = tmodel.loss_temperature(
                {"state": _t(obs["state"])},
                torch.tensor(0.5),
                -float(ACT * TA),
            )
        assert float(ours_a) == pytest.approx(float(theirs_a), rel=2e-3)
        assert float(ours_t) == pytest.approx(float(theirs_t), rel=2e-3)


# ---------------------------------------------------------------------------
# ensembles (RLPD / IBRL)
# ---------------------------------------------------------------------------

N_CRITICS = 3


def _single_q_pair(seed):
    critic = CriticObsAct(
        cond_dim=OBS, mlp_dims=[24, 24], action_dim=ACT, action_steps=TA,
        double_q=False,
    )
    tcritic = TorchCriticObsAct(
        cond_dim=OBS + ACT * TA, mlp_dims=[24, 24], action_dim=0,
        double_q=False,
    )
    return critic, tcritic


def _transport_ensemble(ensemble, tmodel):
    for i in range(N_CRITICS):
        member = jax.tree_util.tree_map(lambda x: x[i], ensemble)
        _copy_plain_mlp(member["params"]["MLP_0"], tmodel.critic_networks[i].Q1)
        _copy_plain_mlp(member["params"]["MLP_0"], tmodel.target_networks[i].Q1)
    tmodel.ensemble_params, tmodel.ensemble_buffers = (
        torch.func.stack_module_state(tmodel.critic_networks)
    )


class TestRLPDParity:
    @pytest.fixture()
    def pair(self):
        fnet, fp, tnet = _make_actor_pair(90, tanh_output=False)
        critic, tcritic = _single_q_pair(91)
        kw = dict(horizon_steps=TA, tanh_output=True, randn_clip_value=10)
        model = RLPDGaussian(
            actor=fnet, critic=critic, n_critics=N_CRITICS,
            backup_entropy=True, **kw,
        )
        params = model.init_rlpd_params(
            jax.random.key(92),
            {"state": jnp.zeros((2, 1, OBS))},
            jnp.zeros((2, TA, ACT)),
            init_temperature=0.5,
        )
        params = params._replace(actor=fp)
        tmodel = TorchRLPD(
            actor=tnet, critic=tcritic, n_critics=N_CRITICS,
            backup_entropy=True, device="cpu", **kw,
        )
        _transport_ensemble(params.critic_ensemble, tmodel)
        tmodel.eval()
        return model, params, tmodel

    def test_loss_critic(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, next_obs, actions, rewards, terminated, rng = _batch(93)
        ours = model.loss_critic(
            params.critic_ensemble, params, obs, next_obs, actions, rewards,
            terminated, 0.99, 0.5, rng,
        )
        r_act, r_ind = jax.random.split(rng)
        noise = np.asarray(jax.random.normal(r_act, (B, TA * ACT)))
        perm = np.asarray(jax.random.permutation(r_ind, N_CRITICS))
        _intercept_normal_sequence(monkeypatch, [noise])
        monkeypatch.setattr(
            torch, "randperm",
            lambda n, **kw: torch.from_numpy(perm.astype(np.int64)),
        )
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions), _t(rewards), _t(terminated), 0.99, 0.5,
            )
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)

    def test_loss_actor_and_temperature(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, _, _, _, _, rng = _batch(94)
        ours_a = model.loss_actor(params.actor, params, obs, 0.5, rng)
        ours_t = model.loss_temperature(
            params.log_alpha, params, obs, -float(ACT * TA), rng
        )
        noise = np.asarray(jax.random.normal(rng, (B, TA * ACT)))
        _intercept_normal_sequence(monkeypatch, [noise, noise])
        with torch.no_grad():
            theirs_a = tmodel.loss_actor({"state": _t(obs["state"])}, 0.5)
            theirs_t = tmodel.loss_temperature(
                {"state": _t(obs["state"])},
                torch.tensor(0.5),
                -float(ACT * TA),
            )
        assert float(ours_a) == pytest.approx(float(theirs_a), rel=2e-3)
        assert float(ours_t) == pytest.approx(float(theirs_t), rel=2e-3)


class TestIBRLParity:
    @pytest.fixture()
    def pair(self):
        # IBRL does not tanh-squash (gaussian_ibrl.py loss_actor comment);
        # head itself squashes the mean
        fnet, fp, tnet = _make_actor_pair(95, tanh_output=True)
        critic, tcritic = _single_q_pair(96)
        kw = dict(horizon_steps=TA, tanh_output=False, randn_clip_value=10)
        model = IBRLGaussian(
            actor=fnet, critic=critic, n_critics=N_CRITICS, **kw
        )
        params = model.init_ibrl_params(
            jax.random.key(97),
            {"state": jnp.zeros((2, 1, OBS))},
            jnp.zeros((2, TA, ACT)),
        )
        params = params._replace(actor=fp, actor_target=fp, bc_policy=fp)
        tmodel = TorchIBRL(
            actor=tnet, critic=tcritic, n_critics=N_CRITICS, device="cpu",
            **kw,
        )
        _transport_ensemble(params.critic_ensemble, tmodel)
        # reference keeps separate bc/target actor copies of the same net
        tmodel.eval()
        return model, params, tmodel

    def test_loss_critic_bc_vs_rl_backup(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, next_obs, actions, rewards, terminated, rng = _batch(98)
        ours = model.loss_critic(
            params.critic_ensemble, params, obs, next_obs, actions, rewards,
            terminated, 0.99, rng,
        )
        r_bc, r_rl, r_ind = jax.random.split(rng, 3)
        noises = [
            np.asarray(jax.random.normal(r_bc, (B, TA * ACT))),
            np.asarray(jax.random.normal(r_rl, (B, TA * ACT))),
        ]
        perm = np.asarray(jax.random.permutation(r_ind, N_CRITICS))
        _intercept_normal_sequence(monkeypatch, noises)
        monkeypatch.setattr(
            torch, "randperm",
            lambda n, **kw: torch.from_numpy(perm.astype(np.int64)),
        )
        with torch.no_grad():
            theirs = tmodel.loss_critic(
                {"state": _t(obs["state"])},
                {"state": _t(next_obs["state"])},
                _t(actions), _t(rewards), _t(terminated), 0.99,
            )
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)

    def test_loss_actor_min_ensemble(self, pair, monkeypatch):
        model, params, tmodel = pair
        obs, _, _, _, _, rng = _batch(99)
        ours = model.loss_actor(params.actor, params, obs, rng)
        noise = np.asarray(jax.random.normal(rng, (B, TA * ACT)))
        _intercept_normal_sequence(monkeypatch, [noise])
        with torch.no_grad():
            theirs = tmodel.loss_actor({"state": _t(obs["state"])})
        assert float(ours) == pytest.approx(float(theirs), rel=2e-3)
