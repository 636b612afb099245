"""Cross-framework golden parity, part 2 (see test_reference_parity.py).

Oracle targets (reference file:line):
  - Gaussian_MLP head           common/mlp_gaussian.py:278-379
  - GaussianModel loss          common/gaussian.py:49-65
  - VPG_Gaussian.get_logprobs   rl/gaussian_vpg.py:50-66
  - GMM_MLP head                common/mlp_gmm.py:11-109
  - GMMModel loss               common/gmm.py:40-55 (MixtureSameFamily)
  - CosineAnnealingWarmupRestarts  util/scheduler.py:32-145 (no-arg step())
  - RunningRewardScaler         util/reward_scaling.py:42-90
  - VitEncoder forward          common/vit.py:27-201
  - Eta modules                 diffusion/eta.py:12-175
  - DDIM stochastic chain       diffusion_vpg.py:228-315 with eta module
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
    from dppo.model.common.mlp_gaussian import Gaussian_MLP as TorchGaussianMLP
    from dppo.model.common.mlp_gmm import GMM_MLP as TorchGMMMLP
    from dppo.model.common.gaussian import GaussianModel as TorchGaussianModel
    from dppo.model.common.gmm import GMMModel as TorchGMMModel
    from dppo.model.rl.gaussian_vpg import VPG_Gaussian as TorchVPGGaussian
    from dppo.model.common.critic import CriticObs as TorchCriticObs
    from dppo.model.common.vit import (
        VitEncoder as TorchVitEncoder,
        VitEncoderConfig,
    )
    from dppo.model.diffusion import eta as ref_eta
    from dppo.model.diffusion.diffusion_vpg import VPGDiffusion as TorchVPGDiffusion
    from dppo.util.scheduler import CosineAnnealingWarmupRestarts
    from dppo.util.reward_scaling import RunningRewardScaler
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion import eta as tpu_eta
from dppo_tpu.diffusion.vpg import VPGDiffusion, VPGParams
from dppo_tpu.models.gaussian import GaussianModel
from dppo_tpu.models.gaussian_vpg import GaussianParams, VPGGaussian
from dppo_tpu.models.gmm import GMMModel
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from dppo_tpu.nets.gaussian_mlp import GaussianMLP
from dppo_tpu.nets.gmm_mlp import GMMMLP
from dppo_tpu.nets.vit import VitEncoder
from dppo_tpu.utils.reward_scaling import init_reward_scaler, scale_rewards
from dppo_tpu.utils.scheduler import cosine_warmup_restarts

from tests.test_reference_parity import (
    _copy_plain_mlp,
    _set_linear,
    copy_diffusion_mlp,
)

OBS, ACT, TA = 11, 3, 4


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _cond(seed, B):
    state = jax.random.normal(jax.random.key(seed), (B, 1, OBS))
    return {"state": state}, {"state": _t(state)}


# ---------------------------------------------------------------------------
# Gaussian family
# ---------------------------------------------------------------------------

def _copy_gaussian_mlp(flax_params, tnet, learned_std):
    p = flax_params["params"]
    if learned_std:
        _copy_plain_mlp(p["MLP_0"], tnet.mlp_base)
        _copy_plain_mlp(p["MLP_1"], tnet.mlp_mean)
        _copy_plain_mlp(p["MLP_2"], tnet.mlp_logvar)
    else:
        _copy_plain_mlp(p["MLP_0"], tnet.mlp_mean)
        if hasattr(tnet, "logvar"):
            with torch.no_grad():
                tnet.logvar.copy_(_t(p["logvar"]))


def _make_gaussian_pair(fixed_std=None, learn_fixed_std=False):
    kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        mlp_dims=[32, 32, 32],
        activation_type="Mish",
        tanh_output=True,
        residual_style=False,
        fixed_std=fixed_std,
        learn_fixed_std=learn_fixed_std,
    )
    fnet = GaussianMLP(**kw)
    fp = fnet.init(jax.random.key(5), {"state": jnp.zeros((2, 1, OBS))})
    tkw = dict(kw)
    tkw["mlp_dims"] = list(kw["mlp_dims"])
    tnet = TorchGaussianMLP(**tkw)
    _copy_gaussian_mlp(fp, tnet, learned_std=fixed_std is None)
    tnet.eval()
    return fnet, fp, tnet


class TestGaussianParity:
    @pytest.mark.parametrize(
        "fixed_std,learn", [(None, False), (0.1, False), (0.1, True)]
    )
    def test_gaussian_mlp_head(self, fixed_std, learn):
        fnet, fp, tnet = _make_gaussian_pair(fixed_std, learn)
        cond_j, cond_t = _cond(6, 5)
        mean_j, scale_j = fnet.apply(fp, cond_j)
        with torch.no_grad():
            mean_t, scale_t = tnet(cond_t)
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(scale_j),
            np.broadcast_to(scale_t.numpy(), mean_t.shape),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_gaussian_bc_loss(self):
        fnet, fp, tnet = _make_gaussian_pair()
        model = GaussianModel(network=fnet, horizon_steps=TA)
        tmodel = TorchGaussianModel(network=tnet, horizon_steps=TA, device="cpu")
        cond_j, cond_t = _cond(7, 6)
        actions = jax.random.normal(jax.random.key(8), (6, TA, ACT))
        loss_j, info_j = model.loss(fp, actions, cond_j, ent_coef=0.01)
        with torch.no_grad():
            loss_t, info_t = tmodel.loss(_t(actions), cond_t, ent_coef=0.01)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)
        assert float(info_j["entropy"]) == pytest.approx(
            float(info_t["entropy"]), rel=1e-4
        )

    def test_vpg_gaussian_get_logprobs(self):
        fnet, fp, tnet = _make_gaussian_pair()
        critic = CriticObs(cond_dim=OBS, mlp_dims=[16, 16])
        cp = critic.init(jax.random.key(9), {"state": jnp.zeros((2, 1, OBS))})
        model = VPGGaussian(actor=fnet, critic=critic, horizon_steps=TA)
        params = GaussianParams(actor=fp, actor_ft=fp, critic=cp)
        tcritic = TorchCriticObs(cond_dim=OBS, mlp_dims=[16, 16])
        tmodel = TorchVPGGaussian(
            actor=tnet, critic=tcritic, horizon_steps=TA, device="cpu"
        )
        cond_j, cond_t = _cond(10, 6)
        actions = jax.random.normal(jax.random.key(11), (6, TA, ACT))
        lp_j, ent_j, std_j = model.get_logprobs(params, cond_j, actions)
        with torch.no_grad():
            lp_t, ent_t, std_t = tmodel.get_logprobs(cond_t, _t(actions))
        np.testing.assert_allclose(
            np.asarray(lp_j), lp_t.numpy(), rtol=1e-4, atol=1e-5
        )
        assert float(ent_j) == pytest.approx(float(ent_t), rel=1e-4)
        assert float(std_j) == pytest.approx(float(std_t), rel=1e-4)


# ---------------------------------------------------------------------------
# GMM family
# ---------------------------------------------------------------------------

def _make_gmm_pair():
    kw = dict(
        action_dim=ACT,
        horizon_steps=TA,
        cond_dim=OBS,
        mlp_dims=[32, 32, 32],
        num_modes=3,
        activation_type="Mish",
        residual_style=False,
    )
    fnet = GMMMLP(**kw)
    fp = fnet.init(jax.random.key(12), {"state": jnp.zeros((2, 1, OBS))})
    tkw = dict(kw)
    tkw["mlp_dims"] = list(kw["mlp_dims"])
    tnet = TorchGMMMLP(**tkw)
    p = fp["params"]
    _copy_plain_mlp(p["MLP_0"], tnet.mlp_mean)
    _copy_plain_mlp(p["MLP_1"], tnet.mlp_logvar)
    _copy_plain_mlp(p["MLP_2"], tnet.mlp_weights)
    tnet.eval()
    return fnet, fp, tnet


class TestGMMParity:
    def test_gmm_mlp_head(self):
        fnet, fp, tnet = _make_gmm_pair()
        cond_j, cond_t = _cond(13, 5)
        mean_j, scale_j, logits_j = fnet.apply(fp, cond_j)
        with torch.no_grad():
            mean_t, scale_t, logits_t = tnet(cond_t)
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(scale_j), scale_t.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_gmm_bc_loss(self):
        fnet, fp, tnet = _make_gmm_pair()
        model = GMMModel(network=fnet, horizon_steps=TA)
        tmodel = TorchGMMModel(network=tnet, horizon_steps=TA, device="cpu")
        cond_j, cond_t = _cond(14, 6)
        actions = jax.random.normal(jax.random.key(15), (6, TA, ACT))
        loss_j, info_j = model.loss(fp, actions, cond_j)
        with torch.no_grad():
            loss_t, info_t = tmodel.loss(_t(actions), cond_t)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)
        assert float(info_j["entropy"]) == pytest.approx(
            float(info_t["entropy"]), rel=1e-4
        )


# ---------------------------------------------------------------------------
# scheduler + reward scaler
# ---------------------------------------------------------------------------

class TestUtilParity:
    @pytest.mark.parametrize(
        "max_lr,min_lr,first_cycle,warmup,gamma",
        [
            (3e-4, 1e-4, 40, 10, 1.0),  # hopper finetune shape
            (1e-3, 1e-5, 25, 0, 1.0),
            (1e-3, 1e-4, 30, 5, 0.5),
        ],
    )
    def test_scheduler_trace_matches_reference_step(
        self, max_lr, min_lr, first_cycle, warmup, gamma
    ):
        """The reference drives the scheduler with no-arg step() after each
        optimizer step (base lr initialised to min_lr, agent convention)."""
        opt = torch.optim.Adam(
            [torch.nn.Parameter(torch.zeros(1))], lr=min_lr
        )
        sched = CosineAnnealingWarmupRestarts(
            opt,
            first_cycle_steps=first_cycle,
            cycle_mult=1.0,
            max_lr=max_lr,
            min_lr=min_lr,
            warmup_steps=warmup,
            gamma=gamma,
        )
        ours = cosine_warmup_restarts(
            max_lr, min_lr, first_cycle, warmup, gamma=gamma
        )
        for step in range(3 * first_cycle):
            ref_lr = sched.get_lr()[0]
            assert float(ours(step)) == pytest.approx(ref_lr, rel=1e-6), (
                f"step {step}"
            )
            sched.step()

    def test_reward_scaler_trace(self):
        n_envs, n_steps, iters = 6, 25, 5
        ref = RunningRewardScaler(num_envs=n_envs, gamma=0.99)
        state = init_reward_scaler(n_envs)
        rng = np.random.default_rng(0)
        scale_jit = jax.jit(scale_rewards)
        for it in range(iters):
            reward = rng.normal(size=(n_steps, n_envs)).astype(np.float32)
            first = (rng.random((n_steps, n_envs)) < 0.1).astype(np.float32)
            ref_scaled = ref(reward.T.copy(), first.T.copy())  # (envs, steps)
            state, scaled = scale_jit(state, jnp.asarray(reward), jnp.asarray(first))
            np.testing.assert_allclose(
                np.asarray(scaled), ref_scaled.T, rtol=1e-4, atol=1e-5,
                err_msg=f"iteration {it}",
            )
            np.testing.assert_allclose(
                float(state.var), float(ref.ret_rms.var), rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(state.ret), ref.ret, rtol=1e-4, atol=1e-5
            )


# ---------------------------------------------------------------------------
# ViT encoder
# ---------------------------------------------------------------------------

def _set_conv(tconv, fl):
    with torch.no_grad():
        # flax Conv kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
        tconv.weight.copy_(
            torch.from_numpy(np.asarray(fl["kernel"]).transpose(3, 2, 0, 1).copy())
        )
        tconv.bias.copy_(torch.from_numpy(np.asarray(fl["bias"]).copy()))


def _set_layernorm(tln, fl):
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(np.asarray(fl["scale"]).copy()))
        tln.bias.copy_(torch.from_numpy(np.asarray(fl["bias"]).copy()))


def copy_vit(flax_params, tenc):
    p = flax_params["params"]
    vit = tenc.vit
    pe = p["PatchEmbed2_0"]
    _set_conv(vit.patch_embed.embed[0], pe["Conv_0"])
    _set_conv(vit.patch_embed.embed[3], pe["Conv_1"])
    with torch.no_grad():
        vit.pos_embed.copy_(_t(p["pos_embed"]))
    i = 0
    while f"TransformerLayer_{i}" in p:
        tl = p[f"TransformerLayer_{i}"]
        tt = vit.net[i]
        _set_layernorm(tt.layer_norm1, tl["LayerNorm_0"])
        _set_layernorm(tt.layer_norm2, tl["LayerNorm_1"])
        mha = tl["MultiHeadAttention_0"]
        _set_linear(tt.mha.qkv_proj, mha["Dense_0"])
        _set_linear(tt.mha.out_proj, mha["Dense_1"])
        _set_linear(tt.linear1, tl["Dense_0"])
        _set_linear(tt.linear2, tl["Dense_1"])
        i += 1
    _set_layernorm(vit.norm, p["LayerNorm_0"])


class TestViTParity:
    def test_vit_forward(self):
        H = W = 48
        fenc = VitEncoder(
            obs_shape=[3, H, W],
            num_channel=3,
            img_h=H,
            img_w=W,
            cfg=dict(
                patch_size=8, depth=2, embed_dim=32, num_heads=4,
                embed_style="embed2", embed_norm=0,
            ),
        )
        obs = jax.random.uniform(
            jax.random.key(16), (3, 3, H, W), minval=0.0, maxval=255.0
        )
        fp = fenc.init(jax.random.key(17), obs)
        tenc = TorchVitEncoder(
            obs_shape=[3, H, W],
            num_channel=3,
            img_h=H,
            img_w=W,
            cfg=VitEncoderConfig(
                patch_size=8, depth=2, embed_dim=32, num_heads=4,
                embed_style="embed2", embed_norm=0,
            ),
        )
        copy_vit(fp, tenc)
        tenc.eval()
        ours = fenc.apply(fp, obs)
        with torch.no_grad():
            theirs = tenc(_t(obs))
        assert np.asarray(ours).shape == tuple(theirs.shape)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4
        )


# ---------------------------------------------------------------------------
# eta modules
# ---------------------------------------------------------------------------

class TestEtaParity:
    def test_eta_fixed_and_action(self):
        cond_j, cond_t = _cond(18, 4)
        for base in (0.3, 0.7):
            f = tpu_eta.EtaFixed(base_eta=base, min_eta=0.1, max_eta=1.0)
            fp = f.init(jax.random.key(0), cond_j)
            r = ref_eta.EtaFixed(base_eta=base, min_eta=0.1, max_eta=1.0)
            with torch.no_grad():
                np.testing.assert_allclose(
                    np.asarray(f.apply(fp, cond_j)),
                    r(cond_t).numpy(),
                    rtol=1e-5,
                    atol=1e-6,
                )
            fa = tpu_eta.EtaAction(action_dim=ACT, base_eta=base)
            fap = fa.init(jax.random.key(0), cond_j)
            ra = ref_eta.EtaAction(action_dim=ACT, base_eta=base)
            with torch.no_grad():
                np.testing.assert_allclose(
                    np.asarray(fa.apply(fap, cond_j)),
                    ra(cond_t).numpy(),
                    rtol=1e-5,
                    atol=1e-6,
                )

    @pytest.mark.parametrize("cls", ["state", "state_action"])
    def test_eta_mlp_variants_with_copied_weights(self, cls):
        cond_j, cond_t = _cond(19, 4)
        if cls == "state":
            f = tpu_eta.EtaState(
                input_dim=OBS, mlp_dims=[16, 16], base_eta=0.7,
                min_eta=0.1, max_eta=1.0,
            )
            r = ref_eta.EtaState(
                input_dim=OBS, mlp_dims=[16, 16], base_eta=0.7,
                min_eta=0.1, max_eta=1.0,
            )
        else:
            f = tpu_eta.EtaStateAction(
                input_dim=OBS, mlp_dims=[16, 16], action_dim=ACT,
                base_eta=0.7, min_eta=0.1, max_eta=1.0,
            )
            r = ref_eta.EtaStateAction(
                input_dim=OBS, mlp_dims=[16, 16], action_dim=ACT,
                base_eta=0.7, min_eta=0.1, max_eta=1.0,
            )
        fp = f.init(jax.random.key(20), cond_j)
        # transport the reference's (xavier-small) weights into the repo tree:
        # repo trunk MLP Dense_0..n-1 <- ref moduleList[0..n-1], zero-init
        # head eta_head <- ref last layer
        p = {"params": dict(fp["params"])}
        trunk = dict(p["params"]["MLP_0"])
        n_trunk = len(trunk)
        for i in range(n_trunk):
            lin = r.mlp_res.moduleList[i].linear_1
            trunk[f"Dense_{i}"] = {
                "kernel": jnp.asarray(lin.weight.detach().numpy().T),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            }
        head = r.mlp_res.moduleList[n_trunk].linear_1
        p["params"]["MLP_0"] = trunk
        p["params"]["eta_head"] = {
            "kernel": jnp.asarray(head.weight.detach().numpy().T),
            "bias": jnp.asarray(head.bias.detach().numpy()),
        }
        with torch.no_grad():
            np.testing.assert_allclose(
                np.asarray(f.apply(p, cond_j)),
                r(cond_t).numpy(),
                rtol=1e-4,
                atol=1e-6,
            )


# ---------------------------------------------------------------------------
# DDIM stochastic chain with an eta module
# ---------------------------------------------------------------------------

class TestDDIMChain:
    def test_ddim_chain_with_eta(self, monkeypatch):
        K, K_DDIM, K_FT = 20, 10, 5
        from tests.test_reference_parity import (
            _init_actor_params,
            _make_flax_actor,
            _make_torch_actor,
        )

        base_p = _init_actor_params(21)
        ft_p = _init_actor_params(22)
        feta = tpu_eta.EtaFixed(base_eta=0.6, min_eta=0.1, max_eta=1.0)
        critic = CriticObs(cond_dim=OBS, mlp_dims=[16, 16])
        cp = critic.init(jax.random.key(23), {"state": jnp.zeros((2, 1, OBS))})
        kw = dict(
            ft_denoising_steps=K_FT,
            min_sampling_denoising_std=0.1,
            horizon_steps=TA,
            obs_dim=OBS,
            action_dim=ACT,
            denoising_steps=K,
            use_ddim=True,
            ddim_steps=K_DDIM,
            randn_clip_value=3,
            eps_clip_value=1.0,
        )
        model = VPGDiffusion(
            actor=_make_flax_actor(), critic=critic, eta=feta, **kw
        )
        B = 4
        cond_j = {"state": jax.random.normal(jax.random.key(24), (B, 1, OBS))}
        eta_p = feta.init(jax.random.key(25), cond_j)
        params = VPGParams(actor=base_p, actor_ft=ft_p, critic=cp, eta=eta_p)

        tmodel = TorchVPGDiffusion(
            actor=_make_torch_actor(),
            critic=TorchCriticObs(cond_dim=OBS, mlp_dims=[16, 16]),
            eta=ref_eta.EtaFixed(base_eta=0.6, min_eta=0.1, max_eta=1.0),
            device="cpu",
            **kw,
        )
        copy_diffusion_mlp(base_p, tmodel.actor)
        copy_diffusion_mlp(ft_p, tmodel.actor_ft)
        tmodel.eval()

        rng = jax.random.key(26)
        sample = jax.jit(
            lambda p, c, r: model.sample(
                p, c, r, deterministic=False, return_chain=True
            )
        )(params, cond_j, rng)

        # replicate the sampler's internal draw sequence (K_DDIM steps)
        r2, xr = jax.random.split(rng)
        draws = [np.asarray(jax.random.normal(xr, (B, TA, ACT)))]
        r = r2
        for _ in range(K_DDIM):
            r, nr = jax.random.split(r)
            draws.append(np.asarray(jax.random.normal(nr, (B, TA, ACT))))
        seq = iter(draws)

        def fake_randn(*size, **kwargs):
            if size and isinstance(size[0], (tuple, torch.Size)):
                size = tuple(size[0])
            return torch.from_numpy(np.asarray(next(seq), np.float32))

        monkeypatch.setattr(torch, "randn", fake_randn)
        monkeypatch.setattr(
            torch, "randn_like",
            lambda t, **kw_: torch.from_numpy(np.asarray(next(seq), np.float32)),
        )
        with torch.no_grad():
            theirs = tmodel.forward(
                {"state": _t(cond_j["state"])},
                deterministic=False,
                return_chain=True,
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
