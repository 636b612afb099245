"""D3IL-style avoid device task (dppo_tpu/envs/device/avoid.py).

- scripted expert demos replay through the JAX task step-for-step (the
  collector's numpy rollout and the device dynamics are the same math) and
  every expert episode finishes un-collided with the one-time reward;
- collision latches and freezes the robot, reward stays 0;
- finish bonus is paid exactly once;
- `avoiding-m5` (the reference's D3IL env name) resolves to the task and
  picks its normalization from the d3il_lowdim wrapper config;
- the shipped avoid_device cfgs run demo->pretrain->fused-finetune e2e.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dppo_tpu.config import get_class, load_config
from dppo_tpu.envs.device import AvoidTask, collect_avoid_demos, make_device_task
from dppo_tpu.envs.device.avoid import (
    COLLISION_RADIUS,
    FINISH_Y,
    MAX_DELTA,
    PILLARS,
    _expert_episode,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _replay(task, start_des, start_pos, deltas):
    """Replay raw-unit deltas through the JAX task; return states+rewards."""
    from dppo_tpu.envs.device.avoid import AvoidState

    state = AvoidState(
        des=jnp.asarray(start_des),
        pos=jnp.asarray(start_pos),
        passed=jnp.asarray(False),
        collided=jnp.asarray(False),
    )
    step = jax.jit(task.step)
    states, rewards = [], []
    for d in deltas:
        a = jnp.asarray(d / MAX_DELTA)  # normalize to [-1,1]
        state, _, r, term = step(state, a, jax.random.key(0))
        states.append(state)
        rewards.append(float(r))
        assert not bool(term)  # d3il wrapper never terminates early
    return states, rewards


def test_expert_demos_replay_and_succeed():
    task = AvoidTask()
    rng = np.random.default_rng(3)
    for _ in range(8):
        obs, acts = _expert_episode(rng, 120)
        states, rewards = _replay(task, obs[0, :2], obs[0, 2:], acts)
        # numpy expert rollout and JAX task dynamics agree step for step
        for i in range(len(acts) - 1):
            np.testing.assert_allclose(
                np.concatenate(
                    [np.asarray(states[i].des), np.asarray(states[i].pos)]
                ),
                obs[i + 1],
                atol=1e-5,
            )
        assert not bool(states[-1].collided)
        assert sum(rewards) == 1.0  # crossed the line, paid once
        assert float(states[-1].pos[1]) >= FINISH_Y


def test_collision_latches_and_freezes():
    task = AvoidTask()
    from dppo_tpu.envs.device.avoid import AvoidState

    # drive straight up the middle: hits the row-1 pillar at (0.5, -0.1)
    state = AvoidState(
        des=jnp.asarray([0.5, -0.25]),
        pos=jnp.asarray([0.5, -0.25]),
        passed=jnp.asarray(False),
        collided=jnp.asarray(False),
    )
    up = jnp.asarray([0.0, 1.0])  # +MAX_DELTA per step
    rewards = []
    for _ in range(60):
        state, _, r, _ = task.step(state, up, jax.random.key(0))
        rewards.append(float(r))
    assert bool(state.collided)
    assert sum(rewards) == 0.0
    # frozen at the collision point, never reached the line
    assert float(state.pos[1]) < 0.0
    d = np.linalg.norm(np.asarray(state.pos) - PILLARS, axis=-1).min()
    assert d <= COLLISION_RADIUS + MAX_DELTA


def test_finish_bonus_once():
    task = AvoidTask()
    from dppo_tpu.envs.device.avoid import AvoidState

    # start beyond all pillars, below the line, far left (no obstacles)
    state = AvoidState(
        des=jnp.asarray([0.25, 0.3]),
        pos=jnp.asarray([0.25, 0.3]),
        passed=jnp.asarray(False),
        collided=jnp.asarray(False),
    )
    up = jnp.asarray([0.0, 1.0])
    rewards = []
    for _ in range(30):
        state, _, r, _ = task.step(state, up, jax.random.key(0))
        rewards.append(float(r))
    assert sum(rewards) == 1.0
    assert bool(state.passed)


def test_avoiding_name_and_normalization_fallback(tmp_path):
    t = make_device_task("avoiding-m5")
    assert isinstance(t, AvoidTask)

    collect_avoid_demos(
        str(tmp_path / "train.npz"), str(tmp_path / "norm.npz"),
        n_episodes=4, max_steps=120,
    )
    from dppo_tpu.envs import make_async
    from dppo_tpu.envs.device import DeviceVectorEnv

    venv = make_async(
        "avoiding-m5",
        num_envs=3,
        backend="device",
        max_episode_steps=8,
        wrappers={
            "d3il_lowdim": {"normalization_path": str(tmp_path / "norm.npz")},
            "multi_step": {
                "n_obs_steps": 1,
                "n_action_steps": 2,
                "max_episode_steps": 8,
                "reset_within_step": True,
            },
        },
        obs_dim=4,
        action_dim=2,
    )
    assert isinstance(venv, DeviceVectorEnv)
    norm = np.load(tmp_path / "norm.npz")
    np.testing.assert_allclose(
        np.asarray(venv.pool.task.obs_min), norm["obs_min"], atol=1e-6
    )
    venv.seed(list(range(3)))
    obs = venv.reset_arg()
    assert obs["state"].shape == (3, 1, 4)
    _, r, term, trunc, _ = venv.step(np.zeros((3, 2, 2), np.float32))
    assert not term.any()  # the task never terminates early


def test_avoid_device_dppo_e2e(tmp_path, monkeypatch):
    """Shipped avoid_device cfgs: expert demos -> pretrain -> fused device
    finetune, tiny shapes."""
    root = str(tmp_path)
    monkeypatch.setenv("DPPO_DATA_DIR", root)
    monkeypatch.setenv("DPPO_LOG_DIR", root)
    collect_avoid_demos(
        f"{root}/d3il/avoid_device/train.npz",
        f"{root}/d3il/avoid_device/normalization.npz",
        n_episodes=4,
        max_steps=120,
    )

    cfg = load_config(
        os.path.join(REPO, "cfg/d3il/pretrain/avoid_device/pre_diffusion_mlp.yaml"),
        overrides=[
            "train.n_epochs=2",
            "train.batch_size=32",
            "train.save_model_freq=2",
            "denoising_steps=4",
            "model.network.mlp_dims=[32, 32, 32]",
            "model.network.time_dim=8",
            f"logdir={root}/pre",
        ],
    )
    get_class(cfg._target_)(cfg).run()

    cfg = load_config(
        os.path.join(REPO, "cfg/d3il/finetune/avoid_device/ft_ppo_diffusion_mlp.yaml"),
        overrides=[
            f"base_policy_path={root}/pre/checkpoint/state_2.pkl",
            "denoising_steps=4",
            "ft_denoising_steps=2",
            "env.n_envs=4",
            "env.max_episode_steps=16",
            "train.n_train_itr=3",
            "train.val_freq=3",
            "train.batch_size=24",
            "train.save_model_freq=10",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.actor.time_dim=8",
            "model.critic.mlp_dims=[32, 32, 32]",
            f"logdir={root}/ft",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()

    import pickle

    with open(f"{root}/ft/result.pkl", "rb") as f:
        rows = pickle.load(f)
    assert len(rows) == 3
    train_rows = [r for r in rows if "train_episode_reward" in r]
    assert train_rows and all(
        np.isfinite(r["train_episode_reward"]) for r in train_rows
    )
