"""End-to-end test of the DPPO fine-tuning loop on the dummy env."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dppo_tpu.config import Config, get_class

OBS, ACT = 5, 2


def _cfg(tmp_path, n_itr=3):
    return Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_diffusion_agent.TrainPPODiffusionAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 42,
            "obs_dim": OBS,
            "action_dim": ACT,
            "denoising_steps": 8,
            "ft_denoising_steps": 4,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "env": Config(
                {
                    "n_envs": 4,
                    "name": "dummy",
                    "env_type": "dummy",
                    "asynchronous": False,
                    "max_episode_steps": 12,
                    "reset_at_iteration": False,
                    "best_reward_threshold_for_success": 0.5,
                    "wrappers": Config(
                        {
                            "dummy_lowdim": Config(
                                {"obs_dim": OBS, "action_dim": ACT}
                            ),
                            "multi_step": Config(
                                {
                                    "n_obs_steps": 1,
                                    "n_action_steps": 2,
                                    "reset_within_step": True,
                                }
                            ),
                        }
                    ),
                }
            ),
            "wandb": None,
            "train": Config(
                {
                    "n_train_itr": n_itr,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 6,
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
                    "save_model_freq": 100,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 32,
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
                    "clip_ploss_coef_base": 0.01,
                    "clip_ploss_coef_rate": 3,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "min_logprob_denoising_std": 0.1,
                    "network_path": None,
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
                            "mlp_dims": [32, 32, 32],
                            "activation_type": "Mish",
                            "residual_style": True,
                        }
                    ),
                    "ft_denoising_steps": 4,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 8,
                }
            ),
        }
    )


def test_dppo_end_to_end(tmp_path):
    cfg = _cfg(tmp_path)
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 3
    # result.pkl written with per-itr records
    assert os.path.exists(agent.result_path)
    import pickle

    with open(agent.result_path, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 3
    # params finite after updates
    import jax

    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # reward scaler accumulated statistics
    assert float(agent.update_state.reward_scaler.count) > 1.0


def test_dppo_ft_annealing_across_promote(tmp_path):
    """ft_denoising_steps_d > 0: the run must survive a promote (actor_ft →
    frozen base, chain shape shrinks) mid-training. Regression test for the
    stale jitted sampler: after promote the sampler input shapes are
    unchanged, so jit would NOT retrace on its own and would emit chains of
    the old K_ft."""
    cfg = _cfg(tmp_path, n_itr=4)
    # anneal 4 -> 2 at the end of itr 1; itrs 2-3 roll out with the shrunken
    # chain (the final promote to 0 fires after the last rollout)
    cfg.model.ft_denoising_steps_d = 2
    cfg.model.ft_denoising_steps_t = 2
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 4
    assert agent.model.ft_denoising_steps < 4  # annealed at least once
    assert agent.K_ft == agent.model.ft_denoising_steps
    # base actor was promoted from actor_ft (they match right after promote,
    # then actor_ft trains further; both must stay finite)
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_dppo_eval_mode_no_update(tmp_path):
    cfg = _cfg(tmp_path, n_itr=1)
    cfg.train.val_freq = 1  # itr 0 -> eval mode
    agent = get_class(cfg._target_)(cfg)
    before = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)[0]
    agent.run()
    after = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)[0]
    np.testing.assert_allclose(before, after)


import jax  # noqa: E402
