"""Robomimic HDF5 demos → stitched npz (+ normalization stats).

Parity with `script/dataset/process_robomimic_dataset.py:90` make_dataset:
concatenates the configured low-dim obs keys per step, min/max-normalizes
obs and actions to [-1, 1], emits `{states, actions, rewards, traj_lengths}`
train/val npz files and `normalization.npz` with obs/action min/max.

Usage:
    python -m dppo_tpu.scripts.process_robomimic_dataset \
        --load_path demo.hdf5 --save_dir data/can [--normalize] \
        [--obs_keys robot0_eef_pos robot0_eef_quat robot0_gripper_qpos object]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger(__name__)

DEFAULT_OBS_KEYS = [
    "robot0_eef_pos",
    "robot0_eef_quat",
    "robot0_gripper_qpos",
    "object",
]


def make_dataset(
    load_path: str,
    save_dir: str,
    save_name_prefix: str = "",
    val_split: float = 0.0,
    normalize: bool = True,
    obs_keys=None,
):
    import h5py

    obs_keys = obs_keys or DEFAULT_OBS_KEYS
    os.makedirs(save_dir, exist_ok=True)
    with h5py.File(load_path, "r") as f:
        demos = sorted(f["data"].keys(), key=lambda x: int(x.split("_")[1]))
        traj_lengths = []
        all_obs, all_actions, all_rewards = [], [], []
        for ep in demos:
            obs = np.concatenate(
                [f[f"data/{ep}/obs/{k}"][()] for k in obs_keys], axis=-1
            )
            actions = f[f"data/{ep}/actions"][()]
            rewards = (
                f[f"data/{ep}/rewards"][()]
                if f"rewards" in f[f"data/{ep}"]
                else np.zeros(len(actions))
            )
            traj_lengths.append(len(actions))
            all_obs.append(obs)
            all_actions.append(actions)
            all_rewards.append(rewards)
        obs_cat = np.concatenate(all_obs).astype(np.float32)
        act_cat = np.concatenate(all_actions).astype(np.float32)
        rew_cat = np.concatenate(all_rewards).astype(np.float32)
    obs_min, obs_max = obs_cat.min(0), obs_cat.max(0)
    act_min, act_max = act_cat.min(0), act_cat.max(0)
    if normalize:
        obs_cat = 2 * (obs_cat - obs_min) / (obs_max - obs_min + 1e-6) - 1
        act_cat = 2 * (act_cat - act_min) / (act_max - act_min + 1e-6) - 1

    traj_lengths = np.asarray(traj_lengths)
    n_val = int(len(traj_lengths) * val_split)
    split_step = int(traj_lengths[: len(traj_lengths) - n_val].sum())
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "train.npz"),
        states=obs_cat[:split_step],
        actions=act_cat[:split_step],
        rewards=rew_cat[:split_step],
        traj_lengths=traj_lengths[: len(traj_lengths) - n_val],
    )
    if n_val:
        np.savez_compressed(
            os.path.join(save_dir, save_name_prefix + "val.npz"),
            states=obs_cat[split_step:],
            actions=act_cat[split_step:],
            rewards=rew_cat[split_step:],
            traj_lengths=traj_lengths[len(traj_lengths) - n_val :],
        )
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "normalization.npz"),
        obs_min=obs_min,
        obs_max=obs_max,
        action_min=act_min,
        action_max=act_max,
    )
    log.info(
        "Saved %d trajectories (%d transitions) to %s",
        len(traj_lengths),
        int(traj_lengths.sum()),
        save_dir,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_path", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--save_name_prefix", default="")
    parser.add_argument("--val_split", type=float, default=0.0)
    parser.add_argument("--normalize", action="store_true")
    parser.add_argument("--obs_keys", nargs="*", default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    make_dataset(
        args.load_path,
        args.save_dir,
        args.save_name_prefix,
        args.val_split,
        args.normalize,
        args.obs_keys,
    )


if __name__ == "__main__":
    main()
