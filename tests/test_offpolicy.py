"""End-to-end tests for off-policy diffusion agents (DQL/DIPO/IDQL/QSM) and
the device replay buffer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.config import Config, get_class
from dppo_tpu.utils.replay import replay_init, replay_insert
from tests.test_agents_more import _env_cfg

OBS, ACT = 5, 2

_ACTOR = Config(
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
)
_CRITIC_QA = Config(
    {
        "_target_": "dppo.model.common.critic.CriticObsAct",
        "cond_dim": OBS,
        "mlp_dims": [32, 32],
        "action_dim": ACT,
        "action_steps": 2,
    }
)


def test_replay_buffer_wraparound():
    example = {"x": np.zeros((3,), np.float32)}
    state = replay_init(8, example)
    ins = jax.jit(replay_insert)
    for i in range(3):
        batch = {"x": jnp.full((5, 3), float(i))}
        state = ins(state, batch)
    assert int(state.size) == 8
    assert int(state.ptr) == 15 % 8
    # newest data must be present (values 1 and 2 fill the buffer)
    vals = np.unique(np.asarray(state.data["x"]))
    assert 0.0 not in vals or int(state.size) == 8


def _base_train(extra):
    cfg = {
        "n_train_itr": 2,
        "n_steps": 5,
        "gamma": 0.99,
        "n_critic_warmup_itr": 0,
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
        "buffer_size": 200,
        "batch_size": 16,
        "replay_ratio": 2,
        "scale_reward_factor": 0.1,
        "target_ema_rate": 0.01,
    }
    cfg.update(extra)
    return Config(cfg)


_CASES = {
    "dql": (
        "dppo.agent.finetune.train_dql_diffusion_agent.TrainDQLDiffusionAgent",
        "dppo.model.diffusion.diffusion_dql.DQLDiffusion",
        {"eta": 1.0},
        {"actor": _ACTOR, "critic": _CRITIC_QA},
    ),
    "dipo": (
        "dppo.agent.finetune.train_dipo_diffusion_agent.TrainDIPODiffusionAgent",
        "dppo.model.diffusion.diffusion_dipo.DIPODiffusion",
        {"action_lr": 1e-4, "action_gradient_steps": 3},
        {"actor": _ACTOR, "critic": _CRITIC_QA},
    ),
    "idql": (
        "dppo.agent.finetune.train_idql_diffusion_agent.TrainIDQLDiffusionAgent",
        "dppo.model.diffusion.diffusion_idql.IDQLDiffusion",
        {
            "critic_tau": 0.01,
            "use_expectile_exploration": True,
            "eval_sample_num": 4,
        },
        {
            "actor": _ACTOR,
            "critic_q": _CRITIC_QA,
            "critic_v": Config(
                {
                    "_target_": "dppo.model.common.critic.CriticObs",
                    "cond_dim": OBS,
                    "mlp_dims": [32, 32],
                }
            ),
        },
    ),
    "qsm": (
        "dppo.agent.finetune.train_qsm_diffusion_agent.TrainQSMDiffusionAgent",
        "dppo.model.diffusion.diffusion_qsm.QSMDiffusion",
        {"q_grad_coeff": 50},
        {"actor": _ACTOR, "critic": _CRITIC_QA},
    ),
}


@pytest.mark.parametrize("name", list(_CASES))
def test_offpolicy_agent_end_to_end(tmp_path, name):
    agent_target, model_target, train_extra, model_nets = _CASES[name]
    cfg = Config(
        {
            "_target_": agent_target,
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _env_cfg(),
            "train": _base_train(train_extra),
            "model": Config(
                {
                    "_target_": model_target,
                    "denoised_clip_value": 1.0,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "network_path": None,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 6,
                    **model_nets,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


# --------------------------------------------- fused device-env variants
_DEVICE_TARGETS = {
    "dql": "dppo_tpu.agents.finetune_offpolicy_device.TrainDQLDiffusionDeviceAgent",
    "dipo": "dppo_tpu.agents.finetune_offpolicy_device.TrainDIPODiffusionDeviceAgent",
    "idql": "dppo_tpu.agents.finetune_offpolicy_device.TrainIDQLDiffusionDeviceAgent",
    "qsm": "dppo_tpu.agents.finetune_offpolicy_device.TrainQSMDiffusionDeviceAgent",
}


def _device_env_cfg(n_envs=4):
    return Config(
        {
            "n_envs": n_envs,
            "name": "linear",
            "backend": "device",
            "max_episode_steps": 8,
            "reset_at_iteration": False,
            "best_reward_threshold_for_success": 0.5,
            "wrappers": Config(
                {
                    "multi_step": Config(
                        {
                            "n_obs_steps": 1,
                            "n_action_steps": 2,
                            "max_episode_steps": 8,
                            "reset_within_step": True,
                        }
                    )
                }
            ),
        }
    )


@pytest.mark.parametrize("name", list(_CASES))
def test_offpolicy_device_agent_fused(tmp_path, name):
    """Each off-policy diffusion family runs fully fused on the device env:
    rollout + replay inserts + its own `_update` in one XLA program per
    iteration (itr 0 is an eval rollout: no inserts, no update)."""
    _, model_target, train_extra, model_nets = _CASES[name]
    cfg = Config(
        {
            "_target_": _DEVICE_TARGETS[name],
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _device_env_cfg(),
            "train": _base_train(train_extra),
            "model": Config(
                {
                    "_target_": model_target,
                    "denoised_clip_value": 1.0,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "network_path": None,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 6,
                    **model_nets,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    # itr 0 eval inserted nothing; itr 1 inserted n_steps * n_envs rows
    assert int(agent.replay.size) == 5 * 4
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_offpolicy_device_agent_rejects_host_env(tmp_path):
    _, model_target, train_extra, model_nets = _CASES["dql"]
    env = _env_cfg()
    cfg = Config(
        {
            "_target_": _DEVICE_TARGETS["dql"],
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": env,
            "train": _base_train(train_extra),
            "model": Config({"_target_": model_target}),
        }
    )
    with pytest.raises(ValueError, match="backend=device"):
        get_class(cfg._target_)(cfg)
