"""End-to-end tests for RWR/AWR diffusion fine-tuning on the dummy env."""

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.config import Config, get_class
from tests.test_agents_more import _env_cfg

OBS, ACT = 5, 2

_MODEL_COMMON = {
    "denoised_clip_value": 1.0,
    "randn_clip_value": 3,
    "min_sampling_denoising_std": 0.1,
    "network_path": None,
    "horizon_steps": 2,
    "obs_dim": OBS,
    "action_dim": ACT,
    "denoising_steps": 6,
}

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


def test_rwr_agent(tmp_path):
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_rwr_diffusion_agent.TrainRWRDiffusionAgent",
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
                    "n_steps": 8,
                    "gamma": 0.99,
                    "lr": 1e-4,
                    "weight_decay": 0,
                    "lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1, "min_lr": 1e-5}
                    ),
                    "beta": 10,
                    "max_reward_weight": 100,
                    "batch_size": 16,
                    "update_epochs": 2,
                    "save_model_freq": 10,
                    "val_freq": 10,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_rwr.RWRDiffusion",
                    "network": _ACTOR,
                    **_MODEL_COMMON,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_awr_agent(tmp_path):
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_awr_diffusion_agent.TrainAWRDiffusionAgent",
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
                    "n_steps": 6,
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
                    "beta": 10,
                    "max_adv_weight": 100,
                    "scale_reward_factor": 0.01,
                    "buffer_size": 48,
                    "batch_size": 16,
                    "replay_ratio": 4,
                    "critic_update_ratio": 2,
                    "save_model_freq": 10,
                    "val_freq": 10,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_awr.AWRDiffusion",
                    "actor": _ACTOR,
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.CriticObs",
                            "cond_dim": OBS,
                            "mlp_dims": [32, 32],
                        }
                    ),
                    **_MODEL_COMMON,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.state.params.actor)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


# --------------------------------------------- fused device-env variant
def test_episode_returns_and_valid_matches_host_split():
    """The device returns/valid scans reproduce the host loop's ragged
    numpy episode split (finetune_rwr_diffusion.py run) element for
    element, including carried-over episodes, unclosed tails, and 1-step
    episodes."""
    import jax.numpy as jnp

    from dppo_tpu.agents.finetune_rwr_device import episode_returns_and_valid

    rng = np.random.default_rng(0)
    gamma = 0.9
    for trial in range(20):
        S, E = rng.integers(2, 12), rng.integers(1, 5)
        rewards = rng.standard_normal((S, E)).astype(np.float32)
        dones = (rng.random((S, E)) < 0.3).astype(np.float32)
        first0 = (rng.random(E) < 0.5).astype(np.float32)

        # host reference: the exact split from the RWR host loop
        firsts = np.zeros((S + 1, E))
        firsts[0] = first0
        firsts[1:] = dones
        ret_ref = np.zeros((S, E), np.float32)
        valid_ref = np.zeros((S, E), np.float32)
        for e in range(E):
            env_steps = np.where(firsts[:, e] == 1)[0]
            for i in range(len(env_steps) - 1):
                start, end = env_steps[i], env_steps[i + 1]
                if end - start <= 1:
                    continue
                r = rewards[start:end, e]
                prev = 0.0
                for t in range(len(r) - 1, -1, -1):
                    prev = r[t] + gamma * prev
                    ret_ref[start + t, e] = prev
                valid_ref[start:end, e] = 1.0

        ret, valid = episode_returns_and_valid(
            jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(first0),
            gamma,
        )
        np.testing.assert_array_equal(
            np.asarray(valid), valid_ref,
            err_msg=f"trial {trial} valid mask",
        )
        np.testing.assert_allclose(
            np.asarray(ret) * valid_ref, ret_ref, atol=1e-5,
            err_msg=f"trial {trial} returns",
        )


def test_rwr_device_agent_fused(tmp_path):
    from tests.test_offpolicy import _device_env_cfg

    cfg = Config(
        {
            "_target_": "dppo_tpu.agents.finetune_rwr_device.TrainRWRDiffusionDeviceAgent",
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
                    "n_steps": 8,
                    "gamma": 0.99,
                    "lr": 1e-4,
                    "weight_decay": 0,
                    "lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1, "min_lr": 1e-5}
                    ),
                    "beta": 10,
                    "max_reward_weight": 100,
                    "batch_size": 16,
                    "update_epochs": 2,
                    "save_model_freq": 10,
                    "val_freq": 10,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.diffusion.diffusion_rwr.RWRDiffusion",
                    "network": _ACTOR,
                    **_MODEL_COMMON,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def _awr_train_cfg(n_steps=6, buffer_size=48):
    return Config(
        {
            "n_train_itr": 3,
            "n_steps": n_steps,
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
            "beta": 10,
            "max_adv_weight": 100,
            "scale_reward_factor": 0.01,
            "buffer_size": buffer_size,
            "batch_size": 16,
            "replay_ratio": 4,
            "critic_update_ratio": 2,
            "save_model_freq": 10,
            "val_freq": 10,
        }
    )


def _awr_model_cfg():
    return Config(
        {
            "_target_": "dppo.model.diffusion.diffusion_awr.AWRDiffusion",
            "actor": _ACTOR,
            "critic": Config(
                {
                    "_target_": "dppo.model.common.critic.CriticObs",
                    "cond_dim": OBS,
                    "mlp_dims": [32, 32],
                }
            ),
            **_MODEL_COMMON,
        }
    )


def test_awr_device_agent_fused(tmp_path):
    """Fused device AWR: rollout + window insert + update in one dispatch;
    the cross-iteration FIFO window survives on device (3 train iters with
    buffer capacity 6 steps vs n_steps=4 exercises partial fill, carry-over,
    and FIFO eviction)."""
    from tests.test_offpolicy import _device_env_cfg

    cfg = Config(
        {
            "_target_": "dppo_tpu.agents.finetune_awr_device.TrainAWRDiffusionDeviceAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _device_env_cfg(),
            "train": _awr_train_cfg(n_steps=4, buffer_size=24),
            "model": _awr_model_cfg(),
        }
    )
    # device env: linear task obs_dim/action_dim come from the env cfg
    cfg["env"]["n_envs"] = 4
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 3
    # itr 0 is eval (val_freq=10); itrs 1,2 train: filled = min(4+4, 6)
    assert int(agent.window.filled) == 6
    leaves = jax.tree_util.tree_leaves(agent.state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_awr_update_never_reads_padding(tmp_path):
    """NaN probe: with n_valid_steps set, the AWR update must never gather
    the front padding rows — fill them with NaN and require finite params,
    losses, and optimizer state after the update."""
    from tests.test_agents_more import _env_cfg

    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_awr_diffusion_agent.TrainAWRDiffusionAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _env_cfg(),
            "train": _awr_train_cfg(),
            "model": _awr_model_cfg(),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    Sb, E, valid = 8, 3, 5
    rng = np.random.default_rng(1)
    obs = rng.standard_normal((Sb, E, 1, OBS)).astype(np.float32)
    actions = rng.standard_normal((Sb, E, 2, ACT)).astype(np.float32)
    rewards = rng.standard_normal((Sb, E)).astype(np.float32)
    terminateds = (rng.random((Sb, E)) < 0.2).astype(np.float32)
    pad = Sb - valid
    obs[:pad] = np.nan
    actions[:pad] = np.nan
    rewards[:pad] = np.nan
    state, loss_actor, loss_critic = agent._update(
        agent.state,
        jnp.asarray(obs),
        jnp.asarray(actions),
        jnp.asarray(rewards),
        jnp.asarray(terminateds),
        jax.random.PRNGKey(0),
        jnp.asarray(1, jnp.int32),
        n_valid_steps=jnp.asarray(valid, jnp.int32),
    )
    assert bool(jnp.isfinite(loss_actor)) and bool(jnp.isfinite(loss_critic))
    leaves = jax.tree_util.tree_leaves((state.params, state.actor_opt, state.critic_opt))
    assert all(bool(jnp.isfinite(l).all()) for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
