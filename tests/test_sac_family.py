"""End-to-end tests for the SAC family: SAC, RLPD, Cal-QL, IBRL."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.config import Config, get_class
from dppo_tpu.data.synthetic import make_synthetic_dataset
from tests.test_agents_more import _env_cfg

OBS, ACT = 5, 2

_GAUSS_ACTOR = Config(
    {
        "_target_": "dppo.model.common.mlp_gaussian.Gaussian_MLP",
        "mlp_dims": [32, 32],
        "cond_dim": OBS,
        "horizon_steps": 2,
        "action_dim": ACT,
        "tanh_output": False,
        "std_min": 0.01,
        "std_max": 0.3,
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
_CRITIC_SINGLE = Config(
    {
        "_target_": "dppo.model.common.critic.CriticObsAct",
        "cond_dim": OBS,
        "mlp_dims": [32, 32],
        "action_dim": ACT,
        "action_steps": 2,
        "double_q": False,
    }
)


def _sac_train(extra=None):
    cfg = {
        "n_train_itr": 12,
        "n_steps": 1,
        "gamma": 0.99,
        "actor_lr": 3e-4,
        "critic_lr": 1e-3,
        "save_model_freq": 100,
        "val_freq": 100,
        "render": Config({"freq": 100, "num": 0}),
        "target_ema_rate": 0.01,
        "scale_reward_factor": 1.0,
        "critic_replay_ratio": 8,
        "actor_replay_ratio": 4,
        "buffer_size": 200,
        "batch_size": 8,
        "n_eval_episode": 2,
        "n_explore_steps": 4,
        "target_entropy": -2.0,
        "init_temperature": 1.0,
    }
    cfg.update(extra or {})
    return Config(cfg)


def _run(cfg_dict):
    cfg = Config(cfg_dict)
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    return agent


def _base(tmp_path, target, model, train):
    return {
        "_target_": target,
        "logdir": str(tmp_path / "log"),
        "seed": 0,
        "obs_dim": OBS,
        "action_dim": ACT,
        "cond_steps": 1,
        "horizon_steps": 2,
        "act_steps": 2,
        "wandb": None,
        "env": _env_cfg(),
        "train": train,
        "model": model,
    }


def test_sac_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_sac.SAC_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_QA,
            "horizon_steps": 2,
            "tanh_output": True,
            "randn_clip_value": 10,
            "network_path": None,
        }
    )
    _run(
        _base(
            tmp_path,
            "dppo.agent.finetune.train_sac_agent.TrainSACAgent",
            model,
            _sac_train(),
        )
    )


def _offline_dataset(tmp_path, mc=False):
    path = str(tmp_path / "offline.npz")
    make_synthetic_dataset(
        path, n_episodes=4, traj_length=30, obs_dim=OBS, action_dim=ACT,
        with_rewards=True,
    )
    node = {
        "_target_": "dppo.agent.dataset.sequence.StitchedSequenceQLearningDataset",
        "dataset_path": path,
        "horizon_steps": 2,
        "cond_steps": 1,
    }
    if mc:
        node["get_mc_return"] = True
        node["discount_factor"] = 0.99
    return Config(node)


def test_rlpd_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_rlpd.RLPD_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_SINGLE,
            "n_critics": 3,
            "horizon_steps": 2,
            "tanh_output": True,
            "backup_entropy": True,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo.agent.finetune.train_rlpd_agent.TrainRLPDAgent",
        model,
        _sac_train({"critic_num_update": 2}),
    )
    cfg["offline_dataset"] = _offline_dataset(tmp_path)
    _run(cfg)


def test_calql_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_calql.CalQL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_QA,
            "horizon_steps": 2,
            "tanh_output": True,
            "cql_min_q_weight": 5.0,
            "cql_n_actions": 3,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo.agent.finetune.train_calql_agent.TrainCalQLAgent",
        model,
        _sac_train(
            {"train_online": True, "n_random_actions": 3, "num_update": 2}
        ),
    )
    cfg["offline_dataset"] = _offline_dataset(tmp_path, mc=True)
    _run(cfg)


def test_ibrl_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_ibrl.IBRL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_SINGLE,
            "n_critics": 3,
            "horizon_steps": 2,
            "soft_action_sample": True,
            "soft_action_sample_beta": 10,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo.agent.finetune.train_ibrl_agent.TrainIBRLAgent",
        model,
        _sac_train({"critic_num_update": 2, "update_freq": 2}),
    )
    _run(cfg)


# --------------------------------------------- fused device-env variants
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


def _device_train_extra():
    # 12 iterations, block 4, explore 4, updates from itr 5 on
    return {"block_iters": 4, "log_freq": 4, "val_freq": 8}


def test_rlpd_device_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_rlpd.RLPD_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_SINGLE,
            "n_critics": 3,
            "horizon_steps": 2,
            "tanh_output": True,
            "backup_entropy": True,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo_tpu.agents.finetune_sac_device.TrainRLPDDeviceAgent",
        model,
        _sac_train({"critic_num_update": 2, **_device_train_extra()}),
    )
    cfg["env"] = _device_env_cfg()
    cfg["offline_dataset"] = _offline_dataset(tmp_path)
    agent = _run(cfg)
    assert int(agent.replay.size) > 0


def test_ibrl_device_agent(tmp_path):
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_ibrl.IBRL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_SINGLE,
            "n_critics": 3,
            "horizon_steps": 2,
            "soft_action_sample": True,
            "soft_action_sample_beta": 10,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo_tpu.agents.finetune_sac_device.TrainIBRLDeviceAgent",
        model,
        _sac_train(
            {"critic_num_update": 2, "update_freq": 2, **_device_train_extra()}
        ),
    )
    cfg["env"] = _device_env_cfg()
    agent = _run(cfg)
    assert int(agent.replay.size) > 0


def test_calql_device_agent(tmp_path):
    """Fused Cal-QL: each block iteration = n_steps env macro-steps +
    pending-window reward-to-go + replay flush + num_update mixed
    offline/online updates, all in one dispatch."""
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_calql.CalQL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_QA,
            "horizon_steps": 2,
            "tanh_output": True,
            "cql_min_q_weight": 5.0,
            "cql_n_actions": 3,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo_tpu.agents.finetune_sac_device.TrainCalQLDeviceAgent",
        model,
        _sac_train(
            {
                "train_online": True,
                "n_random_actions": 3,
                "num_update": 2,
                "n_steps": 2,
                **_device_train_extra(),
            }
        ),
    )
    cfg["env"] = _device_env_cfg()
    cfg["offline_dataset"] = _offline_dataset(tmp_path, mc=True)
    agent = _run(cfg)
    assert int(agent.replay.size) > 0
    assert "reward_to_go" in agent.replay.data


def test_calql_device_offline_phase(tmp_path):
    """train_online=false (the offline pretrain phase): updates run every
    iteration from itr 0 on offline batches only."""
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_calql.CalQL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_QA,
            "horizon_steps": 2,
            "tanh_output": True,
            "cql_min_q_weight": 5.0,
            "cql_n_actions": 3,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo_tpu.agents.finetune_sac_device.TrainCalQLDeviceAgent",
        model,
        _sac_train(
            {
                "train_online": False,
                "n_random_actions": 3,
                "num_update": 2,
                "n_explore_steps": 0,
                "n_train_itr": 6,
                **_device_train_extra(),
            }
        ),
    )
    cfg["env"] = _device_env_cfg()
    cfg["offline_dataset"] = _offline_dataset(tmp_path, mc=True)
    _run(cfg)


def test_replay_insert_masked():
    """Masked ring insert: valid rows land contiguously from ptr in order,
    invalid rows are dropped, ptr/size advance by the valid count only."""
    from dppo_tpu.utils.replay import replay_init, replay_insert_masked

    rp = replay_init(8, {"x": np.zeros((), np.float32)})
    x = jnp.arange(6, dtype=jnp.float32)
    mask = jnp.array([True, False, True, True, False, True])
    rp = jax.jit(replay_insert_masked)(rp, {"x": x}, mask)
    assert int(rp.size) == 4 and int(rp.ptr) == 4
    np.testing.assert_array_equal(
        np.asarray(rp.data["x"][:4]), [0.0, 2.0, 3.0, 5.0]
    )
    # wrap-around: 6 more valid rows from ptr=4 wrap to the front
    x2 = jnp.arange(10, 17, dtype=jnp.float32)
    mask2 = jnp.array([True, True, True, False, True, True, True])
    rp = jax.jit(replay_insert_masked)(rp, {"x": x2}, mask2)
    assert int(rp.size) == 8 and int(rp.ptr) == 2
    np.testing.assert_array_equal(
        np.asarray(rp.data["x"]),
        [15.0, 16.0, 3.0, 5.0, 10.0, 11.0, 12.0, 14.0],
    )


def test_calql_device_episode_mc_rtg(tmp_path):
    """The fused Cal-QL pending window stores TRUE per-episode Monte-Carlo
    reward-to-go: every inserted row satisfies the backward recursion
    rtg[t] = r[t] + gamma * rtg[t+1] within its episode, with episodes
    flushed contiguously and ending at rtg = r (truncation/termination)."""
    model = Config(
        {
            "_target_": "dppo.model.rl.gaussian_calql.CalQL_Gaussian",
            "actor": _GAUSS_ACTOR,
            "critic": _CRITIC_QA,
            "horizon_steps": 2,
            "tanh_output": True,
            "cql_min_q_weight": 5.0,
            "cql_n_actions": 3,
            "network_path": None,
        }
    )
    cfg = _base(
        tmp_path,
        "dppo_tpu.agents.finetune_sac_device.TrainCalQLDeviceAgent",
        model,
        _sac_train(
            {
                "train_online": True,
                "n_random_actions": 3,
                "num_update": 1,
                "n_steps": 2,
                "buffer_size": 4096,
                **_device_train_extra(),
            }
        ),
    )
    cfg["env"] = _device_env_cfg()
    cfg["offline_dataset"] = _offline_dataset(tmp_path, mc=True)
    agent = _run(cfg)
    n = int(agent.replay.size)
    assert n > 0, "no episode completed -> nothing flushed"
    gamma = agent.gamma
    r = np.asarray(agent.replay.data["rewards"][:n])
    g = np.asarray(agent.replay.data["reward_to_go"][:n])
    for t in range(n):
        end_of_episode = abs(g[t] - r[t]) < 1e-5
        chained = t + 1 < n and abs(g[t] - (r[t] + gamma * g[t + 1])) < 1e-4
        assert end_of_episode or chained, (
            f"row {t}: rtg {g[t]} breaks the episode MC recursion "
            f"(r={r[t]}, next rtg={g[t + 1] if t + 1 < n else None})"
        )
