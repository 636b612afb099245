"""Furniture-Bench batched multi-step wrapper.

Capability parity with `env/gym_utils/wrapper/furniture.py:47`
(FurnitureRLSimEnvMultiStepWrapper): wraps a GPU-batched FurnitureRLSimEnv
(IsaacGym) with action chunk stepping (`_inner_step:140`),
"permanent"-reward densification (best-reward accumulation, `:148-155`),
6D-rotation proprio conversion + LinearNormalizer observation normalization
(`process_obs:160`), batched obs stacking (`stack_last_n_obs_dict:21`), and
the timeout-as-termination convention.

IsaacGym is CUDA-only and has no TPU-host port (SURVEY §2.9); this wrapper
is import-gated on `furniture_bench` so the capability is preserved for
hosts that pair a GPU env server with the TPU learner. The math below is
numpy/array-API-agnostic: it accepts torch tensors from the sim and numpy
arrays alike.
"""

from __future__ import annotations

import logging
from collections import deque

import numpy as np

from dppo_tpu.envs.furniture_normalizer import LinearNormalizer

log = logging.getLogger(__name__)


def stack_last_n_obs_dict(all_obs, n_steps: int):
    """(per-key) stack the last n observations with edge padding; adds a
    step dimension at axis 1. Works on numpy or torch tensors."""
    all_obs = list(all_obs)
    result = {}
    start = -min(n_steps, len(all_obs))
    for key in all_obs[-1]:
        sample = all_obs[-1][key]
        stacked = np.stack(
            [np.asarray(o[key]) for o in all_obs[start:]], axis=1
        )
        if n_steps > len(all_obs):
            pad = np.repeat(stacked[:, :1], n_steps - len(all_obs), axis=1)
            stacked = np.concatenate([pad, stacked], axis=1)
        result[key] = stacked
    return result


def proprioceptive_quat_to_6d_rotation(robot_state: np.ndarray) -> np.ndarray:
    """Replace the quaternion (4) in [pos(3), quat(4), rest...] with a 6D
    rotation representation (first two rotation-matrix columns)."""
    robot_state = np.asarray(robot_state)
    pos, quat, rest = (
        robot_state[..., :3],
        robot_state[..., 3:7],
        robot_state[..., 7:],
    )
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    # rotation matrix columns from quaternion (xyzw)
    r00 = 1 - 2 * (y * y + z * z)
    r10 = 2 * (x * y + z * w)
    r20 = 2 * (x * z - y * w)
    r01 = 2 * (x * y - z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r21 = 2 * (y * z + x * w)
    rot6d = np.stack([r00, r10, r20, r01, r11, r21], axis=-1)
    return np.concatenate([pos, rot6d, rest], axis=-1)


class FurnitureRLSimEnvMultiStepWrapper:
    def __init__(
        self,
        env,
        n_obs_steps: int = 1,
        n_action_steps: int = 1,
        max_episode_steps=None,
        sparse_reward: bool = False,
        reset_within_step: bool = False,
        pass_full_observations: bool = False,
        normalization_path=None,
        prev_action: bool = False,
        **kwargs,
    ):
        assert not reset_within_step, (
            "reset_within_step must be False for furniture envs"
        )
        assert not pass_full_observations
        assert not prev_action
        self.env = env
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.max_episode_steps = max_episode_steps
        self.sparse_reward = sparse_reward
        self.normalizer = LinearNormalizer()
        if normalization_path is not None:
            self.normalizer = LinearNormalizer.from_file(normalization_path)
            log.info("Loaded normalization from %s", normalization_path)

    @property
    def pairs_to_assemble(self):
        return self.env.pairs_to_assemble

    def reset(self, **kwargs):
        obs = self.env.reset()
        self.obs = deque(
            [obs], maxlen=max(self.n_obs_steps + 1, self.n_action_steps)
        )
        stacked = stack_last_n_obs_dict(self.obs, self.n_obs_steps)
        self.best_reward = np.zeros(self.env.num_envs, dtype=np.float32)
        return {"state": self.process_obs(stacked)}

    def reset_arg(self, options_list=None):
        return self.reset()

    def reset_one_arg(self, env_ind=None, options=None):
        return self.reset()

    def seed(self, seeds=None):
        pass  # IsaacGym envs do not need seeding (train_agent.py:61-64)

    # split-phase step API (rollout loops call step_async/step_wait on every
    # pool); the GPU-batched sim steps synchronously, so async just stashes
    def step_async(self, actions: np.ndarray):
        self._pending_actions = actions

    def step_wait(self):
        actions = self._pending_actions
        self._pending_actions = None
        return self.step(actions)

    def step(self, action: np.ndarray):
        """action: (n_envs, n_action_steps, action_dim) in [-1, 1]."""
        action = self.normalizer(action, "actions", forward=False)
        obs, sparse_reward, dense_reward, info = self._inner_step(action)
        reward = sparse_reward if self.sparse_reward else dense_reward
        truncated = np.asarray(
            self.env.env_steps >= self.max_episode_steps
        ).reshape(-1)
        nobs = self.process_obs(obs)
        return (
            {"state": nobs},
            np.asarray(reward),
            truncated,
            truncated,
            info,
        )

    def _inner_step(self, action_chunk):
        n = action_chunk.shape[0]
        dense_reward = np.zeros(n, dtype=np.float32)
        sparse_reward = np.zeros(n, dtype=np.float32)
        info = {}
        for i in range(self.n_action_steps):
            obs, reward, done, info = self.env.step(action_chunk[:, i, :])
            self.obs.append(obs)
            r = np.asarray(reward).reshape(-1)
            sparse_reward += r
            self.best_reward += r
            dense_reward += self.best_reward  # "permanent" densification
        stacked = stack_last_n_obs_dict(self.obs, self.n_obs_steps)
        return stacked, sparse_reward, dense_reward, info

    def process_obs(self, obs) -> np.ndarray:
        robot_state = proprioceptive_quat_to_6d_rotation(
            np.asarray(obs["robot_state"])
        )
        parts_poses = np.asarray(obs["parts_poses"])
        full = np.concatenate([robot_state, parts_poses], axis=-1)
        nobs = self.normalizer(full, "observations", forward=True)
        return np.clip(nobs, -5, 5).astype(np.float32)

    def render(self, **kwargs):
        return None

    def close(self):
        if hasattr(self.env, "close"):
            self.env.close()
