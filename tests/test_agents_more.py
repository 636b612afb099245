"""End-to-end tests: Gaussian PPO fine-tuning, Gaussian pretrain, and the
eval agents (including DiffusionEval checkpoint loading)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.config import Config, get_class

OBS, ACT = 5, 2


def _env_cfg(n_envs=4):
    return Config(
        {
            "n_envs": n_envs,
            "name": "dummy",
            "env_type": "dummy",
            "asynchronous": False,
            "max_episode_steps": 12,
            "reset_at_iteration": False,
            "best_reward_threshold_for_success": 0.5,
            "wrappers": Config(
                {
                    "dummy_lowdim": Config({"obs_dim": OBS, "action_dim": ACT}),
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
    )


def _train_cfg(n_itr=2):
    return Config(
        {
            "n_train_itr": n_itr,
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
            "save_model_freq": 1,
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
    )


def test_gaussian_ppo_agent_end_to_end(tmp_path):
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_gaussian_agent.TrainPPOGaussianAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _env_cfg(),
            "train": _train_cfg(),
            "model": Config(
                {
                    "_target_": "dppo.model.rl.gaussian_ppo.PPO_Gaussian",
                    "clip_ploss_coef": 0.1,
                    "randn_clip_value": 3,
                    "network_path": None,
                    "actor": Config(
                        {
                            "_target_": "dppo.model.common.mlp_gaussian.Gaussian_MLP",
                            "mlp_dims": [32, 32],
                            "fixed_std": 0.1,
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
                    "horizon_steps": 2,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_pretrain_gaussian_and_eval(tmp_path):
    from dppo_tpu.data.synthetic import make_synthetic_dataset

    data_path = str(tmp_path / "train.npz")
    make_synthetic_dataset(
        data_path, n_episodes=5, traj_length=40, obs_dim=OBS, action_dim=ACT
    )
    cfg = Config(
        {
            "_target_": "dppo.agent.pretrain.train_gaussian_agent.TrainGaussianAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "wandb": None,
            "train": Config(
                {
                    "n_epochs": 3,
                    "batch_size": 32,
                    "learning_rate": 1e-3,
                    "weight_decay": 0,
                    "lr_scheduler": Config(
                        {"first_cycle_steps": 3, "warmup_steps": 1, "min_lr": 1e-4}
                    ),
                    "save_model_freq": 3,
                    "ent_coef": 0.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.common.gaussian.GaussianModel",
                    "network": Config(
                        {
                            "_target_": "dppo.model.common.mlp_gaussian.Gaussian_MLP",
                            "mlp_dims": [32, 32],
                            "cond_dim": OBS,
                            "horizon_steps": 2,
                            "action_dim": ACT,
                        }
                    ),
                    "horizon_steps": 2,
                }
            ),
            "ema": Config({"decay": 0.99}),
            "train_dataset": Config(
                {
                    "_target_": "dppo.agent.dataset.sequence.StitchedSequenceDataset",
                    "dataset_path": data_path,
                    "horizon_steps": 2,
                    "cond_steps": 1,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    ckpt = str(tmp_path / "log" / "checkpoint" / "state_3.pkl")
    assert os.path.exists(ckpt)

    # eval the pretrained policy
    eval_cfg = Config(
        {
            "_target_": "dppo.agent.eval.eval_gaussian_agent.EvalGaussianAgent",
            "logdir": str(tmp_path / "eval"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "n_steps": 8,
            "render_num": 0,
            "wandb": None,
            "env": _env_cfg(),
            "model": Config(
                {
                    "_target_": "dppo.model.common.gaussian.GaussianModel",
                    "network_path": ckpt,
                    "network": Config(
                        {
                            "_target_": "dppo.model.common.mlp_gaussian.Gaussian_MLP",
                            "mlp_dims": [32, 32],
                            "cond_dim": OBS,
                            "horizon_steps": 2,
                            "action_dim": ACT,
                        }
                    ),
                    "horizon_steps": 2,
                }
            ),
        }
    )
    agent = get_class(eval_cfg._target_)(eval_cfg)
    out = agent.run()
    assert os.path.exists(str(tmp_path / "eval" / "result.npz"))
    assert out["num_episode"] > 0


def test_eval_diffusion_from_finetune_ckpt(tmp_path):
    """DiffusionEval must load a fine-tuned VPGParams checkpoint and sample
    with base/ft dispatch."""
    from dppo_tpu.diffusion.eval import DiffusionEval
    from dppo_tpu.diffusion.vpg import VPGDiffusion
    from dppo_tpu.nets.critic import CriticObs
    from dppo_tpu.nets.diffusion_mlp import DiffusionMLP
    from dppo_tpu.utils.ckpt import save_checkpoint

    actor = DiffusionMLP(
        action_dim=ACT, horizon_steps=2, cond_dim=OBS, time_dim=8,
        mlp_dims=[32, 32, 32], activation_type="ReLU", residual_style=True,
    )
    critic = CriticObs(cond_dim=OBS, mlp_dims=[32, 32, 32], residual_style=True)
    vpg = VPGDiffusion(
        actor=actor, critic=critic, ft_denoising_steps=3,
        horizon_steps=2, obs_dim=OBS, action_dim=ACT, denoising_steps=6,
    )
    cond = {"state": jnp.zeros((4, 1, OBS))}
    params = vpg.init_vpg_params(jax.random.key(0), cond)
    # make ft differ from base so dispatch is observable
    params = params._replace(
        actor_ft=jax.tree_util.tree_map(lambda x: x + 0.1, params.actor_ft)
    )
    ckpt = str(tmp_path / "state_5.pkl")
    save_checkpoint(ckpt, {"itr": 5, "model": params})

    ev = DiffusionEval(
        network_path=ckpt, ft_denoising_steps=3, actor=None,
        network=actor, horizon_steps=2, obs_dim=OBS, action_dim=ACT,
        denoising_steps=6,
    )
    loaded = ev.load_eval_params()
    out = ev.sample(loaded, cond, jax.random.key(1))
    assert out.trajectories.shape == (4, 2, ACT)
    assert bool(jnp.isfinite(out.trajectories).all())
    # ft weights actually differ and drive the last steps
    ev0 = DiffusionEval(
        network_path=ckpt, ft_denoising_steps=0, actor=None,
        network=actor, horizon_steps=2, obs_dim=OBS, action_dim=ACT,
        denoising_steps=6,
    )
    loaded0 = loaded._replace(actor_ft=loaded.actor)
    out0 = ev0.sample(loaded0, cond, jax.random.key(1))
    assert not np.allclose(out.trajectories, out0.trajectories)
