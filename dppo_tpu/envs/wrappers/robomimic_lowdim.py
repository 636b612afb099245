"""Robomimic state-observation task wrapper.

Parity with `env/gym_utils/wrapper/robomimic_lowdim.py:17`
(RobomimicLowdimWrapper): concatenated low-dim keys under "state", optional
min/max→[-1,1] normalization with clamp, per-env video writing via
`options["video_path"]`, terminated always False (episodes end by budget,
`:134`), optional fixed init state. Requires `robomimic` to be importable
(gated in the env factory).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class RobomimicLowdimWrapper:
    def __init__(
        self,
        env,
        normalization_path: Optional[str] = None,
        low_dim_keys: Sequence[str] = (
            "robot0_eef_pos",
            "robot0_eef_quat",
            "robot0_gripper_qpos",
            "object",
        ),
        clamp_obs: bool = False,
        init_state=None,
        render_hw=(256, 256),
        render_camera_name: str = "agentview",
        shape_meta=None,  # accepted for factory uniformity
        **kwargs,
    ):
        self.env = env
        self.init_state = init_state
        self.render_hw = render_hw
        self.render_camera_name = render_camera_name
        self.video_writer = None
        self.clamp_obs = clamp_obs
        self.obs_keys = list(low_dim_keys)
        self.normalize = normalization_path is not None
        if self.normalize:
            norm = np.load(normalization_path)
            self.obs_min = norm["obs_min"]
            self.obs_max = norm["obs_max"]
            self.action_min = norm["action_min"]
            self.action_max = norm["action_max"]
        self.action_space = _Box(env.action_dimension)

    def normalize_obs(self, obs):
        obs = 2 * ((obs - self.obs_min) / (self.obs_max - self.obs_min + 1e-6) - 0.5)
        if self.clamp_obs:
            obs = np.clip(obs, -1, 1)
        return obs

    def unnormalize_action(self, action):
        action = (action + 1) / 2
        return action * (self.action_max - self.action_min) + self.action_min

    def get_observation(self, raw_obs):
        obs = {
            "state": np.concatenate(
                [raw_obs[key] for key in self.obs_keys], axis=0
            ).astype(np.float32)
        }
        if self.normalize:
            obs["state"] = self.normalize_obs(obs["state"]).astype(np.float32)
        return obs

    def seed(self, seed=None):
        if seed is not None:
            np.random.seed(seed=seed)
        else:
            np.random.seed()

    def reset(self, seed=None, options=None):
        options = options or {}
        if self.video_writer is not None:
            self.video_writer.close()
            self.video_writer = None
        if "video_path" in options:
            import imageio

            self.video_writer = imageio.get_writer(options["video_path"], fps=30)
        new_seed = options.get("seed", seed)
        if self.init_state is not None:
            raw_obs = self.env.reset_to({"states": self.init_state})
        elif new_seed is not None:
            self.seed(seed=new_seed)
            raw_obs = self.env.reset()
        else:
            raw_obs = self.env.reset()
        return self.get_observation(raw_obs)

    def step(self, action):
        if self.normalize:
            action = self.unnormalize_action(action)
        raw_obs, reward, done, info = self.env.step(action)
        obs = self.get_observation(raw_obs)
        if self.video_writer is not None:
            self.video_writer.append_data(self.render(mode="rgb_array"))
        # done always False: episodes end by budget (parity :134)
        return obs, float(reward), False, False, info

    def render(self, mode="rgb_array", **kwargs):
        h, w = self.render_hw
        return self.env.render(
            mode=mode, height=h, width=w, camera_name=self.render_camera_name
        )

    def close(self):
        if self.video_writer is not None:
            self.video_writer.close()


class _Box:
    def __init__(self, dim):
        self.shape = (dim,)
        self.dtype = np.float32

    def sample(self):
        return np.zeros(self.shape, dtype=np.float32)
