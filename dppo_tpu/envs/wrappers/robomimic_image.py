"""Robomimic image-observation task wrapper.

Parity with `env/gym_utils/wrapper/robomimic_image.py:16`
(RobomimicImageWrapper): low-dim keys concatenated under "state"
(normalized), camera images channel-stacked under "rgb" and scaled to
[0, 255]; done always False; per-env video writing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dppo_tpu.envs.wrappers.robomimic_lowdim import RobomimicLowdimWrapper, _Box


class RobomimicImageWrapper(RobomimicLowdimWrapper):
    def __init__(
        self,
        env,
        shape_meta: dict,
        normalization_path: Optional[str] = None,
        low_dim_keys: Sequence[str] = (
            "robot0_eef_pos",
            "robot0_eef_quat",
            "robot0_gripper_qpos",
        ),
        image_keys: Sequence[str] = (
            "agentview_image",
            "robot0_eye_in_hand_image",
        ),
        clamp_obs: bool = False,
        init_state=None,
        render_hw=(256, 256),
        render_camera_name: str = "agentview",
        **kwargs,
    ):
        super().__init__(
            env,
            normalization_path=normalization_path,
            low_dim_keys=low_dim_keys,
            clamp_obs=clamp_obs,
            init_state=init_state,
            render_hw=render_hw,
            render_camera_name=render_camera_name,
        )
        self.low_dim_keys = list(low_dim_keys)
        self.image_keys = list(image_keys)
        self.obs_keys = self.low_dim_keys + self.image_keys
        self.shape_meta = shape_meta

    def get_observation(self, raw_obs):
        rgb, state = None, None
        for key in self.obs_keys:
            if key in self.image_keys:
                rgb = (
                    raw_obs[key]
                    if rgb is None
                    else np.concatenate([rgb, raw_obs[key]], axis=0)
                )  # C, H, W
            else:
                state = (
                    raw_obs[key]
                    if state is None
                    else np.concatenate([state, raw_obs[key]], axis=-1)
                )
        if self.normalize:
            state = self.normalize_obs(state)
        return {
            "state": np.asarray(state, dtype=np.float32),
            "rgb": np.asarray(rgb, dtype=np.float32) * 255.0,  # [0,1]->[0,255]
        }
