"""TPU-resident pixel path: on-device rendering + the fully fused vision
DPPO iteration (render -> ViT policy -> env step -> PPO update in one XLA
program)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.config import Config, get_class

H = W = 24


def _pixel_cfg(tmp_path, n_envs=4, n_steps=4, n_itr=3, train_extra=None):
    backbone = Config(
        {
            "_target_": "dppo.model.common.vit.VitEncoder",
            "obs_shape": [3, H, W],
            "num_channel": 3,
            "img_h": H,
            "img_w": W,
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
            "_target_": (
                "dppo_tpu.agents.finetune_ppo_diffusion_device."
                "TrainPPOImgDiffusionDeviceAgent"
            ),
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": 1,  # proprio: normalized thdot only
            "action_dim": 1,
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
                            "state": Config({"shape": [1]}),
                        }
                    ),
                    "action": Config({"shape": [1]}),
                }
            ),
            "env": Config(
                {
                    "n_envs": n_envs,
                    "name": "pendulum_pixels",
                    "backend": "device",
                    "max_episode_steps": 8,
                    "reset_at_iteration": False,
                    "best_reward_threshold_for_success": -0.1,
                    "device_task_kwargs": Config({"img_h": H, "img_w": W}),
                    "wrappers": Config(
                        {
                            "multi_step": Config(
                                {
                                    "n_obs_steps": 1,
                                    "n_action_steps": 2,
                                    "max_episode_steps": 8,
                                    "reset_within_step": True,
                                }
                            ),
                        }
                    ),
                }
            ),
            "train": Config(
                {
                    "n_train_itr": n_itr,
                    "n_critic_warmup_itr": 0,
                    "n_steps": n_steps,
                    "gamma": 0.99,
                    "augment": True,
                    "grad_accumulate": 2,
                    "logprob_batch_size": 8,
                    "actor_lr": 1e-4,
                    "actor_weight_decay": 0,
                    "actor_lr_scheduler": Config(
                        {
                            "first_cycle_steps": 10,
                            "warmup_steps": 1,
                            "min_lr": 1e-5,
                        }
                    ),
                    "critic_lr": 1e-3,
                    "critic_weight_decay": 0,
                    "critic_lr_scheduler": Config(
                        {
                            "first_cycle_steps": 10,
                            "warmup_steps": 1,
                            "min_lr": 1e-4,
                        }
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
                            "cond_dim": 1,
                            "horizon_steps": 2,
                            "action_dim": 1,
                        }
                    ),
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.ViTCritic",
                            "backbone": backbone,
                            "cond_dim": 1,
                            "mlp_dims": [32, 32, 32],
                            "spatial_emb": 16,
                            "residual_style": True,
                        }
                    ),
                    "ft_denoising_steps": 2,
                    "horizon_steps": 2,
                    "obs_dim": 1,
                    "action_dim": 1,
                    "denoising_steps": 4,
                }
            ),
        }
    )
    for k, v in (train_extra or {}).items():
        cfg["train"][k] = v
    return cfg


def test_pendulum_pixels_render_geometry():
    """The rasterizer draws the rod where gymnasium would: θ=0 up, θ=π
    down, θ=π/2 to the right; the pivot dot is always centered."""
    from dppo_tpu.envs.device.pendulum import render_pendulum_rgb

    def frame(th):
        cs = jnp.asarray([np.cos(th), np.sin(th)], jnp.float32)
        return np.asarray(render_pendulum_rgb(cs, 33, 33))

    up = frame(0.0)
    down = frame(np.pi)
    right = frame(np.pi / 2)
    c = 16  # center pixel
    # rod channel: mass above vs below the pivot
    assert up[0, :c, :].sum() > 4 * up[0, c + 1 :, :].sum()
    assert down[0, c + 1 :, :].sum() > 4 * down[0, :c, :].sum()
    assert right[0, :, c + 1 :].sum() > 4 * right[0, :, :c].sum()
    # pivot channel peaks at the center in every frame
    for f in (up, down, right):
        assert f[2, c, c] == f[2].max() > 0.5
    # frames are [0, 1]
    assert up.min() >= 0.0 and up.max() <= 1.0


def test_pendulum_pixels_split_obs_shapes():
    from dppo_tpu.envs.device import make_device_task

    task = make_device_task("pendulum_pixels", img_h=H, img_w=W)
    hist = jnp.zeros((5, 2, 3), jnp.float32)  # (E, To, latent 3)
    obs = task.split_obs(hist)
    assert obs["rgb"].shape == (5, 2, 3, H, W)
    assert obs["state"].shape == (5, 2, 1)


def test_img_device_adapter_obs_dict():
    """Host agents driving the pixel env through the venv adapter get the
    split obs dict (rgb + proprio), including final_obs on truncation."""
    from dppo_tpu.envs import make_async

    venv = make_async(
        env_name="pendulum_pixels",
        env_type=None,
        num_envs=2,
        backend="device",
        max_episode_steps=2,
        device_task_kwargs={"img_h": H, "img_w": W},
        wrappers={
            "multi_step": {
                "n_obs_steps": 1,
                "n_action_steps": 1,
                "max_episode_steps": 2,
                "reset_within_step": True,
            }
        },
    )
    obs = venv.reset_arg()
    assert obs["rgb"].shape == (2, 1, 3, H, W)
    assert obs["state"].shape == (2, 1, 1)
    for _ in range(2):
        obs, rew, term, trunc, infos = venv.step(
            np.zeros((2, 1, 1), np.float32)
        )
    assert trunc.all()
    assert infos[0]["final_obs"]["rgb"].shape == (1, 3, H, W)


def test_img_device_dppo_end_to_end(tmp_path):
    """The fused pixel iteration: on-device rendering + ViT policy + PPO
    update (aug, grad accum, chunked recompute) in one XLA program."""
    cfg = _pixel_cfg(tmp_path)
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 3
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_img_device_eval_agent(tmp_path):
    """EvalImgDiffusionAgent drives the pixel device env through the venv
    adapter: all obs modalities (rgb + proprio) reach the policy cond."""
    cfg = _pixel_cfg(tmp_path, n_envs=2, n_steps=2, n_itr=1)
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    ckpt = str(tmp_path / "log" / "checkpoint" / "state_0.pkl")

    from dppo_tpu.config import load_config
    import os

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ecfg = load_config(
        os.path.join(
            REPO, "cfg/gym/eval/pendulum-v1/eval_diffusion_mlp_img.yaml"
        ),
        overrides=[
            f"logdir={tmp_path}/eval",
            f"base_policy_path={ckpt}",
            "env.n_envs=2",
            "env.max_episode_steps=4",
            "img_h=24",
            "img_w=24",
            "n_steps=2",
            "horizon_steps=2",
            "act_steps=2",
            "denoising_steps=4",
            "ft_denoising_steps=2",
            "model.network.mlp_dims=[32, 32, 32]",
            "model.network.time_dim=8",
            "model.network.spatial_emb=16",
            "model.network.backbone.cfg.embed_dim=32",
            "model.network.backbone.cfg.num_heads=2",
            "wandb=null",
        ],
    )
    eagent = get_class(ecfg._target_)(ecfg)
    eagent.run()
    import os.path as osp

    assert osp.exists(osp.join(str(tmp_path / "eval"), "result.npz"))
