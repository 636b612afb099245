"""Filter D3IL avoiding-task demos by gap modes and emit stitched npz.

Parity with `script/dataset/filter_d3il_avoid_data.py` (360 LoC): each
trajectory is labeled with the 9 gap modes it passes through (the avoid
task's three pillar levels, geometry constants from the env); trajectories
are kept when they hit any `desired_mode`, hit all `required_modes`, avoid
all `avoid_modes`, and (optionally) match per-mode quota ratios; kept
trajectories are min/max-normalized against the FILTERED subset and written
as stitched `train.npz` + `normalization.npz`.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Sequence

import numpy as np

from dppo_tpu.data.d3il_dataset import AvoidingDataset

log = logging.getLogger(__name__)

# avoid-env geometry (parity: filter_d3il_avoid_data.py:38-50)
LEVEL_DISTANCE = 0.18
OBSTACLE_OFFSET = 0.075
L1_Y = -0.1
L2_Y = L1_Y + LEVEL_DISTANCE
L3_Y = L1_Y + 2 * LEVEL_DISTANCE
L1_X = 0.5
L2_TOP_X, L2_BOT_X = 0.5 - OBSTACLE_OFFSET, 0.5 + OBSTACLE_OFFSET
L3_TOP_X, L3_MID_X, L3_BOT_X = (
    0.5 - 2 * OBSTACLE_OFFSET,
    0.5,
    0.5 + 2 * OBSTACLE_OFFSET,
)


def check_mode(x: np.ndarray) -> np.ndarray:
    """9-dim one-hot-ish mode encoding of a single (x, y) robot position."""
    rx, ry = x[0], x[1]
    enc = np.zeros(9)
    if ry - 0.01 <= L1_Y <= ry + 0.01:
        if rx < L1_X:
            enc[0] = 1
        elif rx > L1_X:
            enc[1] = 1
    if ry - 0.01 <= L2_Y <= ry + 0.01:
        if rx < L2_TOP_X:
            enc[2] = 1
        elif L2_TOP_X < rx < L2_BOT_X:
            enc[3] = 1
        elif rx > L2_BOT_X:
            enc[4] = 1
    if ry >= L3_Y:
        if rx < L3_TOP_X:
            enc[5] = 1
        if L3_TOP_X < rx < L3_MID_X:
            enc[6] = 1
        elif L3_MID_X < rx < L3_BOT_X:
            enc[7] = 1
        elif rx > L3_TOP_X:
            enc[8] = 1
    return enc


def make_dataset(
    load_path: str,
    save_dir: str,
    save_name_prefix: str = "",
    desired_modes: Sequence[int] = (),
    desired_mode_ratios: Optional[Sequence[float]] = None,
    required_modes: Sequence[int] = (),
    avoid_modes: Sequence[int] = (),
    max_len_data: int = 200,
):
    ds = AvoidingDataset(
        load_path, obs_dim=4, action_dim=2, max_len_data=max_len_data
    )
    chosen, chosen_desired_idx = [], []
    for i in range(ds.num_data):
        T = ds.get_seq_length(i)
        obs_traj = ds.observations[i, :T]
        flag_desired = False
        desired_idx = None
        flag_required = (
            [False] * len(required_modes) if required_modes else [True]
        )
        flag_avoid = False
        for ob in obs_traj:
            modes = check_mode(ob)
            if desired_modes and any(modes[d] for d in desired_modes):
                desired_idx = int(
                    np.argmax([modes[d] for d in desired_modes])
                )
                flag_desired = True
            if not desired_modes:
                flag_desired = True
            if any(modes[a] for a in avoid_modes):
                flag_avoid = True
                break
            for j, req in enumerate(required_modes):
                if modes[req]:
                    flag_required[j] = True
        if flag_avoid or not flag_desired or not all(flag_required):
            continue
        chosen.append(i)
        chosen_desired_idx.append(desired_idx)

    # per-mode quotas (parity :120-140): keep at most ratio * total per mode
    if desired_mode_ratios:
        total = len(chosen)
        quota = [int(r * total) for r in desired_mode_ratios]
        counts = [0] * len(desired_modes)
        kept, kept_idx = [], []
        for i, d in zip(chosen, chosen_desired_idx):
            if d is None or counts[d] < quota[d]:
                if d is not None:
                    counts[d] += 1
                kept.append(i)
        chosen = kept
    log.info("Kept %d / %d trajectories", len(chosen), ds.num_data)

    states_l, actions_l, lengths = [], [], []
    for i in chosen:
        T = ds.get_seq_length(i)
        states_l.append(ds.observations[i, :T])
        actions_l.append(ds.actions[i, :T])
        lengths.append(T)
    states = np.concatenate(states_l)
    actions = np.concatenate(actions_l)
    obs_min, obs_max = states.min(0), states.max(0)
    act_min, act_max = actions.min(0), actions.max(0)
    norm_s = 2 * (states - obs_min) / (obs_max - obs_min + 1e-6) - 1
    norm_a = 2 * (actions - act_min) / (act_max - act_min + 1e-6) - 1
    os.makedirs(save_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "train.npz"),
        states=norm_s.astype(np.float32),
        actions=norm_a.astype(np.float32),
        traj_lengths=np.asarray(lengths),
    )
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "normalization.npz"),
        obs_min=obs_min,
        obs_max=obs_max,
        action_min=act_min,
        action_max=act_max,
    )
    return chosen


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_path", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--save_name_prefix", default="")
    parser.add_argument("--desired_modes", type=int, nargs="*", default=[])
    parser.add_argument(
        "--desired_mode_ratios", type=float, nargs="*", default=None
    )
    parser.add_argument("--required_modes", type=int, nargs="*", default=[])
    parser.add_argument("--avoid_modes", type=int, nargs="*", default=[])
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    make_dataset(
        args.load_path,
        args.save_dir,
        args.save_name_prefix,
        args.desired_modes,
        args.desired_mode_ratios,
        args.required_modes,
        args.avoid_modes,
    )


if __name__ == "__main__":
    main()
