"""D3IL per-task demonstration loaders (numpy/JAX, no torch).

Capability parity with `agent/dataset/d3il_dataset/` (~2.3k LoC vendored):
  - TrajectoryDataset (`base_dataset.py:7`) — padded (B, T, dim) trajectory
    store with validity masks, sliding-window slices, get_all_* accessors.
  - AvoidingDataset (`avoiding_dataset.py:11`) — obs = [robot des_c_pos XY,
    robot c_pos XY], action = desired-position deltas; the only task the
    reference's configs exercise (SURVEY §2.5).
  - PushingDataset (`pushing_dataset.py`) — adds red/green box poses with
    tan(yaw) orientation features.
  - AligningDataset (`aligning_dataset.py:54-103`) — full-3D desired/current
    EE positions plus push-box and target-box pose (pos + raw quat).
  - SortingDataset (`sorting_dataset.py:71-130`) — 2/4/6 colored boxes, each
    contributing XY + tan(yaw).
  - StackingDataset (`stacking_dataset.py:94-155`) — 7-DoF desired joint
    positions + gripper width + three box poses; action = joint-position
    deltas concatenated with the next gripper width.

`to_stitched_npz` converts any TrajectoryDataset into the stitched npz
schema consumed by :mod:`dppo_tpu.data.sequence`, replacing the reference's
`script/dataset/process_d3il_dataset.py` pipeline.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Sequence

import numpy as np

log = logging.getLogger(__name__)


def quat2euler_yaw(quat: np.ndarray) -> np.ndarray:
    """Yaw (z-euler) from wxyz quaternions (subset of geo_transform.py)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


class TrajectoryDataset:
    """Padded trajectory store with sliding-window slices."""

    def __init__(
        self,
        data_directory: str,
        device=None,  # parity; arrays are numpy/host
        obs_dim: int = 20,
        action_dim: int = 2,
        max_len_data: int = 256,
        window_size: int = 1,
    ):
        self.data_directory = data_directory
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.max_len_data = max_len_data
        self.window_size = window_size
        self.observations: np.ndarray  # (B, T, obs_dim)
        self.actions: np.ndarray  # (B, T, action_dim)
        self.masks: np.ndarray  # (B, T)

    # ---- shared machinery (parity: avoiding_dataset.py:77-126) ----
    def _finalize(self, inputs, actions, masks):
        self.observations = np.concatenate(inputs).astype(np.float32)
        self.actions = np.concatenate(actions).astype(np.float32)
        self.masks = np.concatenate(masks).astype(np.float32)
        self.num_data = len(self.observations)
        self.slices = self.get_slices()

    def get_slices(self):
        slices = []
        for i in range(self.num_data):
            T = self.get_seq_length(i)
            if T - self.window_size < 0:
                log.info(
                    "Ignored short sequence #%d: len=%d, window=%d",
                    i, T, self.window_size,
                )
            else:
                slices += [
                    (i, start, start + self.window_size)
                    for start in range(T - self.window_size + 1)
                ]
        return slices

    def get_seq_length(self, idx):
        return int(self.masks[idx].sum())

    def get_all_actions(self):
        return np.concatenate(
            [self.actions[i, : self.get_seq_length(i)] for i in range(self.num_data)]
        )

    def get_all_observations(self):
        return np.concatenate(
            [
                self.observations[i, : self.get_seq_length(i)]
                for i in range(self.num_data)
            ]
        )

    def __len__(self):
        return len(self.slices)

    def __getitem__(self, idx):
        i, start, end = self.slices[idx]
        return (
            self.observations[i, start:end],
            self.actions[i, start:end],
            self.masks[i, start:end],
        )


class AvoidingDataset(TrajectoryDataset):
    def __init__(self, data_directory, obs_dim: int = 4, action_dim: int = 2,
                 max_len_data: int = 256, window_size: int = 1, **kwargs):
        super().__init__(
            data_directory, obs_dim=obs_dim, action_dim=action_dim,
            max_len_data=max_len_data, window_size=window_size,
        )
        inputs, actions, masks = [], [], []
        for file in sorted(os.listdir(data_directory)):
            with open(os.path.join(data_directory, file), "rb") as f:
                env_state = pickle.load(f)
            zero_obs = np.zeros((1, max_len_data, obs_dim), np.float32)
            zero_act = np.zeros((1, max_len_data, action_dim), np.float32)
            zero_mask = np.zeros((1, max_len_data), np.float32)
            robot_des_pos = env_state["robot"]["des_c_pos"][:, :2]
            robot_c_pos = env_state["robot"]["c_pos"][:, :2]
            input_state = np.concatenate((robot_des_pos, robot_c_pos), -1)
            vel_state = robot_des_pos[1:] - robot_des_pos[:-1]
            valid_len = len(vel_state)
            zero_obs[0, :valid_len] = input_state[:-1]
            zero_act[0, :valid_len] = vel_state
            zero_mask[0, :valid_len] = 1
            inputs.append(zero_obs)
            actions.append(zero_act)
            masks.append(zero_mask)
        self._finalize(inputs, actions, masks)


class PushingDataset(TrajectoryDataset):
    def __init__(self, data_directory, file_list=None, obs_dim: int = 10,
                 action_dim: int = 2, max_len_data: int = 256,
                 window_size: int = 1, **kwargs):
        super().__init__(
            data_directory, obs_dim=obs_dim, action_dim=action_dim,
            max_len_data=max_len_data, window_size=window_size,
        )
        if file_list is None:
            files: Sequence[str] = sorted(os.listdir(data_directory))
        else:
            files = np.load(file_list, allow_pickle=True)
        inputs, actions, masks = [], [], []
        for file in files:
            with open(os.path.join(data_directory, file), "rb") as f:
                env_state = pickle.load(f)
            zero_obs = np.zeros((1, max_len_data, obs_dim), np.float32)
            zero_act = np.zeros((1, max_len_data, action_dim), np.float32)
            zero_mask = np.zeros((1, max_len_data), np.float32)
            robot_des_pos = env_state["robot"]["des_c_pos"][:, :2]
            robot_c_pos = env_state["robot"]["c_pos"][:, :2]
            red_box_pos = env_state["red-box"]["pos"][:, :2]
            red_box_yaw = np.tan(
                quat2euler_yaw(env_state["red-box"]["quat"])[:, None]
            )
            green_box_pos = env_state["green-box"]["pos"][:, :2]
            green_box_yaw = np.tan(
                quat2euler_yaw(env_state["green-box"]["quat"])[:, None]
            )
            input_state = np.concatenate(
                (robot_des_pos, robot_c_pos, red_box_pos, red_box_yaw,
                 green_box_pos, green_box_yaw),
                axis=-1,
            )
            vel_state = robot_des_pos[1:] - robot_des_pos[:-1]
            valid_len = len(input_state) - 1
            zero_obs[0, :valid_len] = input_state[:-1]
            zero_act[0, :valid_len] = vel_state
            zero_mask[0, :valid_len] = 1
            inputs.append(zero_obs)
            actions.append(zero_act)
            masks.append(zero_mask)
        self._finalize(inputs, actions, masks)


class AligningDataset(TrajectoryDataset):
    """Obs = [des_c_pos(3), c_pos(3), push-box pos(3)+quat(4), target-box
    pos(3)+quat(4)] = 20; action = 3D desired-position deltas
    (parity: aligning_dataset.py:54-103)."""

    def __init__(self, data_directory, obs_dim: int = 20, action_dim: int = 3,
                 max_len_data: int = 512, window_size: int = 1, **kwargs):
        super().__init__(
            data_directory, obs_dim=obs_dim, action_dim=action_dim,
            max_len_data=max_len_data, window_size=window_size,
        )
        inputs, actions, masks = [], [], []
        for file in sorted(os.listdir(data_directory)):
            with open(os.path.join(data_directory, file), "rb") as f:
                env_state = pickle.load(f)
            zero_obs = np.zeros((1, max_len_data, obs_dim), np.float32)
            zero_act = np.zeros((1, max_len_data, action_dim), np.float32)
            zero_mask = np.zeros((1, max_len_data), np.float32)
            robot_des_pos = env_state["robot"]["des_c_pos"]
            robot_c_pos = env_state["robot"]["c_pos"]
            input_state = np.concatenate(
                (
                    robot_des_pos,
                    robot_c_pos,
                    env_state["push-box"]["pos"],
                    env_state["push-box"]["quat"],
                    env_state["target-box"]["pos"],
                    env_state["target-box"]["quat"],
                ),
                axis=-1,
            )
            vel_state = robot_des_pos[1:] - robot_des_pos[:-1]
            valid_len = len(input_state) - 1
            zero_obs[0, :valid_len] = input_state[:-1]
            zero_act[0, :valid_len] = vel_state
            zero_mask[0, :valid_len] = 1
            inputs.append(zero_obs)
            actions.append(zero_act)
            masks.append(zero_mask)
        self._finalize(inputs, actions, masks)


class SortingDataset(TrajectoryDataset):
    """Obs = [des XY, c XY] + per-box [XY, tan(yaw)] for num_boxes in
    {2,4,6} boxes alternating red/blue; action = desired-XY deltas
    (parity: sorting_dataset.py:71-130)."""

    BOX_NAMES = {
        2: ["red-box1", "blue-box1"],
        4: ["red-box1", "red-box2", "blue-box1", "blue-box2"],
        6: ["red-box1", "red-box2", "red-box3",
            "blue-box1", "blue-box2", "blue-box3"],
    }

    def __init__(self, data_directory, num_boxes: int = 2,
                 obs_dim: int | None = None, action_dim: int = 2,
                 max_len_data: int = 600, window_size: int = 1, **kwargs):
        if num_boxes not in self.BOX_NAMES:
            raise ValueError(f"num_boxes must be one of 2/4/6, got {num_boxes}")
        obs_dim = obs_dim or 4 + 3 * num_boxes
        super().__init__(
            data_directory, obs_dim=obs_dim, action_dim=action_dim,
            max_len_data=max_len_data, window_size=window_size,
        )
        inputs, actions, masks = [], [], []
        for file in sorted(os.listdir(data_directory)):
            with open(os.path.join(data_directory, file), "rb") as f:
                env_state = pickle.load(f)
            zero_obs = np.zeros((1, max_len_data, obs_dim), np.float32)
            zero_act = np.zeros((1, max_len_data, action_dim), np.float32)
            zero_mask = np.zeros((1, max_len_data), np.float32)
            robot_des_pos = env_state["robot"]["des_c_pos"][:, :2]
            robot_c_pos = env_state["robot"]["c_pos"][:, :2]
            feats = [robot_des_pos, robot_c_pos]
            for name in self.BOX_NAMES[num_boxes]:
                feats.append(env_state[name]["pos"][:, :2])
                feats.append(
                    np.tan(quat2euler_yaw(env_state[name]["quat"])[:, None])
                )
            input_state = np.concatenate(feats, axis=-1)
            vel_state = robot_des_pos[1:] - robot_des_pos[:-1]
            valid_len = len(input_state) - 1
            zero_obs[0, :valid_len] = input_state[:-1]
            zero_act[0, :valid_len] = vel_state
            zero_mask[0, :valid_len] = 1
            inputs.append(zero_obs)
            actions.append(zero_act)
            masks.append(zero_mask)
        self._finalize(inputs, actions, masks)


class StackingDataset(TrajectoryDataset):
    """Obs = [des_j_pos(7), gripper(1)] + red/green/blue box [pos(3),
    tan(yaw)(1)] = 20; action = joint deltas(7) ++ next gripper width(1)
    (parity: stacking_dataset.py:94-155)."""

    def __init__(self, data_directory, obs_dim: int = 20, action_dim: int = 8,
                 max_len_data: int = 1000, window_size: int = 1, **kwargs):
        super().__init__(
            data_directory, obs_dim=obs_dim, action_dim=action_dim,
            max_len_data=max_len_data, window_size=window_size,
        )
        inputs, actions, masks = [], [], []
        for file in sorted(os.listdir(data_directory)):
            with open(os.path.join(data_directory, file), "rb") as f:
                env_state = pickle.load(f)
            zero_obs = np.zeros((1, max_len_data, obs_dim), np.float32)
            zero_act = np.zeros((1, max_len_data, action_dim), np.float32)
            zero_mask = np.zeros((1, max_len_data), np.float32)
            robot_des_j_pos = env_state["robot"]["des_j_pos"]
            robot_gripper = env_state["robot"]["gripper_width"][:, None]
            feats = [robot_des_j_pos, robot_gripper]
            for name in ("red-box", "green-box", "blue-box"):
                feats.append(env_state[name]["pos"])
                feats.append(
                    np.tan(quat2euler_yaw(env_state[name]["quat"])[:, None])
                )
            input_state = np.concatenate(feats, axis=-1)
            vel_state = robot_des_j_pos[1:] - robot_des_j_pos[:-1]
            valid_len = len(input_state) - 1
            zero_obs[0, :valid_len] = input_state[:-1]
            zero_act[0, :valid_len] = np.concatenate(
                (vel_state, robot_gripper[1:]), axis=-1
            )
            zero_mask[0, :valid_len] = 1
            inputs.append(zero_obs)
            actions.append(zero_act)
            masks.append(zero_mask)
        self._finalize(inputs, actions, masks)


# per-task dims used by the reference's converter
# (process_d3il_dataset.py:20-59)
TASK_SPECS = {
    "align": dict(cls=AligningDataset, action_dim=3, obs_dim=20,
                  max_len_data=512),
    "avoid": dict(cls=AvoidingDataset, action_dim=2, obs_dim=4,
                  max_len_data=200),
    "push": dict(cls=PushingDataset, action_dim=2, obs_dim=10,
                 max_len_data=512),
    "sort": dict(cls=SortingDataset, action_dim=2, obs_dim=10,
                 max_len_data=600, num_boxes=2),
    "stack": dict(cls=StackingDataset, action_dim=8, obs_dim=20,
                  max_len_data=1000),
}


def to_stitched_npz(
    dataset: TrajectoryDataset,
    save_path: str,
    norm_path: str | None = None,
):
    """Convert a TrajectoryDataset to the stitched npz schema + stats
    (replaces `script/dataset/process_d3il_dataset.py`)."""
    states_l, actions_l, lengths = [], [], []
    for i in range(dataset.num_data):
        T = dataset.get_seq_length(i)
        if T == 0:
            continue
        states_l.append(dataset.observations[i, :T])
        actions_l.append(dataset.actions[i, :T])
        lengths.append(T)
    states = np.concatenate(states_l)
    actions = np.concatenate(actions_l)
    obs_min, obs_max = states.min(0), states.max(0)
    act_min, act_max = actions.min(0), actions.max(0)
    norm_s = 2 * (states - obs_min) / (obs_max - obs_min + 1e-6) - 1
    norm_a = 2 * (actions - act_min) / (act_max - act_min + 1e-6) - 1
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    np.savez_compressed(
        save_path,
        states=norm_s.astype(np.float32),
        actions=norm_a.astype(np.float32),
        traj_lengths=np.asarray(lengths),
    )
    if norm_path:
        np.savez_compressed(
            norm_path,
            obs_min=obs_min,
            obs_max=obs_max,
            action_min=act_min,
            action_max=act_max,
        )
    return save_path
