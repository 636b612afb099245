"""DDIM sampling path with learnable eta + ft-step annealing coverage."""

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.config import Config, get_class
from dppo_tpu.diffusion.vpg import VPGDiffusion
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from tests.test_agents_more import _env_cfg

OBS, ACT = 5, 2


def _vpg_ddim(**kw):
    from dppo_tpu.diffusion.eta import EtaFixed

    actor = DiffusionMLP(
        action_dim=ACT, horizon_steps=2, cond_dim=OBS, time_dim=8,
        mlp_dims=[32, 32, 32], activation_type="ReLU", residual_style=True,
    )
    critic = CriticObs(cond_dim=OBS, mlp_dims=[32, 32])
    return VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=kw.pop("ft", 3),
        horizon_steps=2, obs_dim=OBS, action_dim=ACT, denoising_steps=12,
        use_ddim=True, ddim_steps=6,
        eta=kw.pop("eta", EtaFixed(base_eta=0.5, min_eta=0.1, max_eta=1.0)),
        **kw,
    )


def test_ddim_chain_and_logprobs():
    model = _vpg_ddim()
    cond = {"state": jax.random.normal(jax.random.key(0), (4, 1, OBS))}
    params = model.init_vpg_params(jax.random.key(1), cond)
    out = model.sample(params, cond, jax.random.key(2), return_chain=True)
    assert out.trajectories.shape == (4, 2, ACT)
    assert out.chains.shape == (4, 3 + 1, 2, ACT)  # ft+1 recorded states
    logp = model.get_logprobs(params, cond, out.chains)
    assert logp.shape == (4 * 3, 2, ACT)
    assert bool(jnp.isfinite(logp).all())
    # deterministic DDIM: same key (same x0) -> identical actions, and the
    # sampler must be repeatable
    det = model.sample(params, cond, jax.random.key(2), deterministic=True)
    det2 = model.sample(params, cond, jax.random.key(2), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(det.trajectories), np.asarray(det2.trajectories),
        rtol=1e-5, atol=1e-6,
    )
    assert bool(jnp.isfinite(det.trajectories).all())


def test_ft_annealing_promotes_base():
    model = _vpg_ddim(ft=4, ft_denoising_steps_d=2, ft_denoising_steps_t=1)
    assert model.ft_denoising_steps == 4
    promoted = model.step()
    assert promoted and model.ft_denoising_steps == 2
    promoted = model.step()
    assert promoted and model.ft_denoising_steps == 0
    promoted = model.step()
    assert promoted and model.ft_denoising_steps == 0


def test_dppo_ddim_learn_eta_agent(tmp_path):
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_diffusion_agent.TrainPPODiffusionAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "denoising_steps": 12,
            "ft_denoising_steps": 3,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _env_cfg(),
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 5,
                    "gamma": 0.99,
                    "actor_lr": 1e-4,
                    "actor_weight_decay": 0,
                    "actor_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1, "min_lr": 1e-5}
                    ),
                    "critic_lr": 1e-3,
                    "critic_weight_decay": 0,
                    "critic_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1, "min_lr": 1e-4}
                    ),
                    "eta_lr": 1e-4,
                    "eta_weight_decay": 0,
                    "eta_update_interval": 2,
                    "eta_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1, "min_lr": 1e-5}
                    ),
                    "save_model_freq": 10,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 16,
                    "update_epochs": 2,
                    "vf_coef": 0.5,
                    "target_kl": 1.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_ppo.PPODiffusion",
                    "gamma_denoising": 0.99,
                    "clip_ploss_coef": 0.01,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "min_logprob_denoising_std": 0.1,
                    "network_path": None,
                    "use_ddim": True,
                    "ddim_steps": 6,
                    "learn_eta": True,
                    "eta": Config(
                        {
                            "_target_": "dppo.model.diffusion.eta.EtaFixed",
                            # base == max saturates the tanh logit (zero
                            # gradient, same as the reference); start inside
                            # the responsive range so learning is observable
                            "base_eta": 0.7,
                            "min_eta": 0.1,
                            "max_eta": 1.0,
                        }
                    ),
                    "actor": Config(
                        {
                            "_target_": "dppo.model.diffusion.mlp_diffusion.DiffusionMLP",
                            "time_dim": 8,
                            "mlp_dims": [32, 32, 32],
                            "activation_type": "ReLU",
                            "residual_style": True,
                            "cond_dim": OBS,
                            "horizon_steps": 2,
                            "action_dim": ACT,
                        }
                    ),
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.CriticObs",
                            "cond_dim": OBS,
                            "mlp_dims": [32, 32],
                        }
                    ),
                    "ft_denoising_steps": 3,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 12,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    eta_before = float(
        jax.tree_util.tree_leaves(agent.update_state.params.eta)[0][0]
    )
    agent.run()
    assert agent.itr == 2
    eta_after = float(
        jax.tree_util.tree_leaves(agent.update_state.params.eta)[0][0]
    )
    # learnable eta params updated by the eta optimizer
    assert eta_before != eta_after
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
