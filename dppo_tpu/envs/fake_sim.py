"""Fake simulator doubles for the gated task wrappers.

The robomimic/D3IL/Furniture simulators cannot be installed in this image,
so their task wrappers (`envs/wrappers/robomimic_lowdim.py`,
`robomimic_image.py`, `d3il_lowdim.py`, `wrappers/furniture.py`) were
previously import-gated and never executed. Following the reference's own
`dummy_env_fn` test pattern (`env/gym_utils/__init__.py:23-40` builds a
throwaway env purely to infer spaces), these doubles implement the EXACT
API surface each wrapper touches — `reset`/`reset_to`/`step` 4-tuples,
`action_dimension`, raw-obs dict keys, offscreen `render`, the
torch-tensor batched Furniture protocol (`env/gym_utils/wrapper/
furniture.py:47-170`: `num_envs`, `env_steps`, `pairs_to_assemble`,
batched `step`) — so the wrapper chain, normalization, video writer, and
done-semantics run for real in CI and in `env.fake_sim=true` smoke drives.

Dynamics are deterministic toy integrators: observations move linearly
under the action and the reward is a negative distance, enough for
pipelines to produce non-degenerate trajectories.
"""

from __future__ import annotations

import numpy as np


class FakeRobosuiteEnv:
    """Stands in for robosuite via `EnvUtils.create_env_from_metadata(...)`.

    Raw-obs dict keys follow the robomimic "can" task layout:
    robot0_eef_pos (3,), robot0_eef_quat (4,), robot0_gripper_qpos (2,),
    object (obj_dim,), plus (C, H, W) float [0, 1] camera images for the
    image wrapper (`robomimic_image.py:29-32` key convention).
    """

    def __init__(
        self,
        action_dim: int = 7,
        obj_dim: int = 14,
        image_keys=("agentview_image", "robot0_eye_in_hand_image"),
        img_hw=(48, 48),
        seed: int = 0,
    ):
        self.action_dimension = action_dim
        self.obj_dim = obj_dim
        self.image_keys = tuple(image_keys)
        self.img_hw = tuple(img_hw)
        self._rng = np.random.default_rng(seed)
        self._t = 0
        self._state = np.zeros(9 + obj_dim, dtype=np.float64)

    # -- robomimic EnvBase surface used by the wrappers --
    def reset(self):
        self._t = 0
        self._state = self._rng.normal(scale=0.1, size=self._state.shape)
        return self._raw_obs()

    def reset_to(self, state_dict):
        self._t = 0
        init = np.asarray(state_dict["states"], dtype=np.float64).ravel()
        self._state = np.resize(init, self._state.shape)
        return self._raw_obs()

    def step(self, action):
        action = np.asarray(action, dtype=np.float64).ravel()
        drive = np.resize(action, self._state.shape)
        self._state = 0.95 * self._state + 0.05 * drive
        self._t += 1
        reward = float(-np.linalg.norm(self._state[:3]))
        return self._raw_obs(), reward, False, {}

    def render(self, mode="rgb_array", height=256, width=256, camera_name=None):
        img = np.zeros((height, width, 3), dtype=np.uint8)
        img[:, :, 0] = (self._t * 7) % 256
        img[:, :, 1] = np.linspace(0, 255, width, dtype=np.uint8)[None, :]
        return img

    def _raw_obs(self):
        s = self._state
        obs = {
            "robot0_eef_pos": s[:3].copy(),
            "robot0_eef_quat": s[3:7].copy(),
            "robot0_gripper_qpos": s[7:9].copy(),
            "object": s[9:].copy(),
        }
        H, W = self.img_hw
        for i, key in enumerate(self.image_keys):
            frame = np.zeros((3, H, W), dtype=np.float32)
            frame[0] = (np.tanh(s[0]) + 1.0) / 2.0
            frame[1] = (i + 1) / (len(self.image_keys) + 1)
            frame[2] = (self._t % 10) / 10.0
            obs[key] = frame
        return obs


class FakeD3ilEnv:
    """Stands in for a D3IL gym env (`d3il_lowdim.py`: old-gym 4-tuple)."""

    class _Space:
        def __init__(self, dim):
            self.shape = (dim,)
            self.dtype = np.float32

    def __init__(self, obs_dim: int = 4, action_dim: int = 2, seed: int = 0):
        self.action_space = self._Space(action_dim)
        self._rng = np.random.default_rng(seed)
        self._obs = np.zeros(obs_dim, dtype=np.float64)

    def reset(self):
        self._obs = self._rng.normal(scale=0.1, size=self._obs.shape)
        return self._obs.copy()

    def step(self, action):
        action = np.asarray(action, dtype=np.float64).ravel()
        self._obs = self._obs + 0.1 * np.resize(action, self._obs.shape)
        reward = float(-np.abs(self._obs).sum())
        return self._obs.copy(), reward, False, {}

    def render(self):
        return np.zeros((32, 32, 3), dtype=np.uint8)


class FakeFurnitureEnv:
    """Stands in for FurnitureRLSimEnv (IsaacGym): torch-tensor batched API
    per `wrapper/furniture.py:47-170` — batched `step`, `num_envs`,
    `env_steps` counter, `pairs_to_assemble`."""

    def __init__(
        self,
        num_envs: int = 4,
        action_dim: int = 10,
        parts_dim: int = 35,
        robot_rest_dim: int = 9,  # state = pos(3) + quat(4) + rest
        seed: int = 0,
    ):
        import torch

        self._torch = torch
        self.num_envs = num_envs
        self.action_dim = action_dim
        self.parts_dim = parts_dim
        self.robot_dim = 7 + robot_rest_dim
        self.pairs_to_assemble = [(0, 1)]
        self.env_steps = torch.zeros(num_envs, dtype=torch.long)
        g = torch.Generator().manual_seed(seed)
        self._gen = g
        self._robot = torch.zeros(num_envs, self.robot_dim)
        self._parts = torch.zeros(num_envs, parts_dim)

    def _obs(self):
        return {
            "robot_state": self._robot.clone(),
            "parts_poses": self._parts.clone(),
        }

    def reset(self):
        torch = self._torch
        self.env_steps = torch.zeros(self.num_envs, dtype=torch.long)
        self._robot = 0.1 * torch.randn(
            self.num_envs, self.robot_dim, generator=self._gen
        )
        # keep quaternions roughly normalized so 6D conversion is sane
        q = self._robot[:, 3:7]
        self._robot[:, 3:7] = q / (q.norm(dim=-1, keepdim=True) + 1e-6)
        self._parts = 0.1 * torch.randn(
            self.num_envs, self.parts_dim, generator=self._gen
        )
        return self._obs()

    def step(self, action):
        torch = self._torch
        a = torch.as_tensor(np.asarray(action), dtype=torch.float32)
        self._robot = 0.95 * self._robot + 0.05 * a.mean(dim=-1, keepdim=True)
        self._parts = self._parts + 0.01
        self.env_steps = self.env_steps + 1
        # sparse-ish per-env reward: 1 when parts drift passes a threshold
        reward = (self._parts[:, :1] > 0.05).float()
        done = torch.zeros(self.num_envs, dtype=torch.bool)
        return self._obs(), reward, done, {}

    def close(self):
        pass
