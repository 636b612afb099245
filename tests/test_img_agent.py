"""End-to-end test of pixel DPPO (VisionDiffusionMLP + ViT + ViTCritic) on
the dummy image env, with buffer-level augmentation and grad accumulation."""

import jax
import jax.numpy as jnp

from dppo_tpu.config import Config, get_class

OBS, ACT, H, W = 5, 2, 32, 32


def img_cfg(tmp_path, n_envs=2, n_steps=4, img_h=H, img_w=W,
            train_extra=None):
    """Shared pixel-DPPO config factory (also used by
    tests/test_chunked_recompute.py)."""
    backbone = Config(
        {
            "_target_": "dppo.model.common.vit.VitEncoder",
            "obs_shape": [3, img_h, img_w],
            "num_channel": 3,
            "img_h": img_h,
            "img_w": img_w,
            "cfg": Config(
                {
                    "patch_size": 8,
                    "depth": 1,
                    "embed_dim": 32,
                    "num_heads": 2,
                    "embed_style": "embed2",
                    "embed_norm": 0,
                }
            ),
        }
    )
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_diffusion_img_agent.TrainPPOImgDiffusionAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "denoising_steps": 4,
            "ft_denoising_steps": 2,
            "cond_steps": 1,
            "img_cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "shape_meta": Config(
                {
                    "obs": Config(
                        {
                            "rgb": Config({"shape": [3, H, W]}),
                            "state": Config({"shape": [OBS]}),
                        }
                    ),
                    "action": Config({"shape": [ACT]}),
                }
            ),
            "env": Config(
                {
                    "n_envs": n_envs,
                    "name": "dummy",
                    "env_type": "dummy",
                    "asynchronous": False,
                    "max_episode_steps": 8,
                    "reset_at_iteration": False,
                    "best_reward_threshold_for_success": 0.5,
                    "wrappers": Config(
                        {
                            "dummy_img": Config(
                                {
                                    "obs_dim": OBS,
                                    "action_dim": ACT,
                                    "img_h": img_h,
                                    "img_w": img_w,
                                }
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
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": n_steps,
                    "gamma": 0.99,
                    "augment": True,
                    "grad_accumulate": 2,
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
                    "actor": Config(
                        {
                            "_target_": "dppo.model.diffusion.mlp_diffusion.VisionDiffusionMLP",
                            "backbone": backbone,
                            "img_cond_steps": 1,
                            "augment": False,
                            "spatial_emb": 16,
                            "time_dim": 8,
                            "mlp_dims": [32, 32, 32],
                            "residual_style": True,
                            "cond_dim": OBS,
                            "horizon_steps": 2,
                            "action_dim": ACT,
                        }
                    ),
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.ViTCritic",
                            "backbone": backbone,
                            "cond_dim": OBS,
                            "mlp_dims": [32, 32, 32],
                            "spatial_emb": 16,
                            "residual_style": True,
                        }
                    ),
                    "ft_denoising_steps": 2,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 4,
                }
            ),
        }
    )
    for k, v in (train_extra or {}).items():
        cfg["train"][k] = v
    return cfg


def test_img_dppo_end_to_end(tmp_path):
    cfg = img_cfg(tmp_path)
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
