"""Tests for the exact-likelihood PPO path: ODE likelihood sanity + e2e agent."""

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.config import Config, get_class
from dppo_tpu.diffusion.exact import PPOExactDiffusion
from dppo_tpu.diffusion.sde import VPSDE
from dppo_tpu.nets.critic import CriticObs
from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
from tests.test_agents_more import _env_cfg

OBS, ACT = 5, 2


def _model():
    actor = DiffusionMLP(
        action_dim=ACT, horizon_steps=2, cond_dim=OBS, time_dim=8,
        mlp_dims=[32, 32, 32], activation_type="ReLU", residual_style=True,
    )
    critic = CriticObs(cond_dim=OBS, mlp_dims=[32, 32])
    return PPOExactDiffusion(
        sde=VPSDE(),
        clip_ploss_coef=0.1,
        actor=actor,
        critic=critic,
        ft_denoising_steps=3,
        horizon_steps=2,
        obs_dim=OBS,
        action_dim=ACT,
        denoising_steps=6,
        sde_int_steps=8,
    )


def test_exact_logprob_finite_and_ordered():
    """Likelihood must be finite, and actions near the policy's own samples
    should not be wildly less likely than random far-away actions."""
    model = _model()
    cond = {"state": jnp.zeros((4, 1, OBS))}
    params = model.init_vpg_params(jax.random.key(0), cond)
    samples = model.sample(
        params, cond, jax.random.key(1), return_chain=False
    ).trajectories
    lp = model.get_exact_logprobs(params, cond, samples, jax.random.key(2))
    assert lp.shape == (4,)
    assert np.all(np.isfinite(np.asarray(lp)))
    far = 50.0 * jnp.ones_like(samples)
    lp_far = model.get_exact_logprobs(params, cond, far, jax.random.key(2))
    assert float(lp.mean()) > float(lp_far.mean())


def test_exact_ppo_agent_end_to_end(tmp_path):
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_exact_diffusion_agent.TrainPPOExactDiffusionAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _env_cfg(),
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 4,
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
                    "save_model_freq": 10,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 8,
                    "update_epochs": 1,
                    "vf_coef": 0.5,
                    "target_kl": 1.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_ppo_exact.PPOExactDiffusion",
                    "sde": Config(
                        {"_target_": "dppo.model.diffusion.sde_lib.VPSDE"}
                    ),
                    "clip_ploss_coef": 0.1,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "min_logprob_denoising_std": 0.1,
                    "network_path": None,
                    "sde_int_steps": 6,
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
                    "denoising_steps": 6,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_exact_ppo_device_agent_fused(tmp_path):
    """Exact-likelihood DPPO fully fused on a device env: rollout + ODE
    log-prob PPO update in one XLA program per iteration."""
    from tests.test_offpolicy import _device_env_cfg

    cfg = Config(
        {
            "_target_": "dppo_tpu.agents.finetune_ppo_gaussian_device.TrainPPOExactDiffusionDeviceAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _device_env_cfg(),
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 4,
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
                    "save_model_freq": 10,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 8,
                    "update_epochs": 1,
                    "vf_coef": 0.5,
                    "target_kl": 1.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_ppo_exact.PPOExactDiffusion",
                    "sde": Config(
                        {"_target_": "dppo.model.diffusion.sde_lib.VPSDE"}
                    ),
                    "clip_ploss_coef": 0.1,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "min_logprob_denoising_std": 0.1,
                    "network_path": None,
                    "sde_int_steps": 6,
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
                    "denoising_steps": 6,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_exact_logprob_grid_convergence():
    """Error-vs-grid-resolution study backing the fixed-grid RK4 choice
    (documented deviation from torchdiffeq's adaptive solver): with the
    Hutchinson probe held fixed, halving the step must shrink the error
    against a fine-grid reference, and the shipped default resolution
    (sde_int_steps=20) must sit within 1% of it. The reverse drift is
    piecewise-constant in t (discrete-beta indexing), so formal RK4 order
    does not apply — monotone convergence at the grid scale is the claim."""
    from dppo_tpu.diffusion.sde import VPSDE

    def model_with(steps):
        actor = DiffusionMLP(
            action_dim=ACT, horizon_steps=2, cond_dim=OBS, time_dim=8,
            mlp_dims=[32, 32, 32], activation_type="ReLU",
            residual_style=True,
        )
        critic = CriticObs(cond_dim=OBS, mlp_dims=[32, 32])
        return PPOExactDiffusion(
            sde=VPSDE(), clip_ploss_coef=0.1, actor=actor, critic=critic,
            ft_denoising_steps=3, horizon_steps=2, obs_dim=OBS,
            action_dim=ACT, denoising_steps=6, sde_int_steps=steps,
        )

    cond = {"state": jax.random.normal(jax.random.key(3), (6, 1, OBS))}
    ref_model = model_with(160)
    params = ref_model.init_vpg_params(jax.random.key(0), cond)
    samples = ref_model.sample(
        params, cond, jax.random.key(1), return_chain=False
    ).trajectories
    probe = jax.random.key(2)

    ref = np.asarray(
        ref_model.get_exact_logprobs(params, cond, samples, probe)
    )
    errs = []
    for steps in (10, 20, 40, 80):
        m = model_with(steps)
        lp = np.asarray(m.get_exact_logprobs(params, cond, samples, probe))
        errs.append(float(np.abs(lp - ref).mean()))
    # monotone refinement toward the fine-grid limit (coarser than 10 steps
    # aliases against the discrete-beta grid and is excluded)
    assert errs[0] > errs[1] > errs[2] > errs[3], errs
    # the shipped default (20 steps) is within 1% relative error
    # (measured: ~0.08% at this operating point)
    scale = float(np.abs(ref).mean())
    assert errs[1] <= 0.01 * scale, (errs, scale)
