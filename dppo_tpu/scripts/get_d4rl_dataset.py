"""D4RL dataset → stitched npz (+ normalization stats).

Parity with `script/dataset/get_d4rl_dataset.py:15` make_dataset: pulls the
offline dataset via `env.get_dataset()`, splits trajectories on
terminals/timeouts, min/max-normalizes, saves train npz + normalization.npz.

Requires `d4rl` (not in this image) — when unavailable, use
`dppo_tpu.data.synthetic.collect_gym_demos` to gather demos from the live
gymnasium env instead.

Usage:
    python -m dppo_tpu.scripts.get_d4rl_dataset --env_name hopper-medium-v2 \
        --save_dir data/gym/hopper-medium-v2
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger(__name__)


def make_dataset(env_name: str, save_dir: str, save_name_prefix: str = "",
                 val_split: float = 0.0, max_episodes: int = 100000):
    try:
        import gym  # noqa
        import d4rl.gym_mujoco  # noqa
    except ImportError as e:
        raise ImportError(
            "d4rl is not installed in this environment; use "
            "dppo_tpu.data.synthetic.collect_gym_demos to generate demos "
            "from the live gymnasium env instead"
        ) from e
    env = gym.make(env_name)
    env.reset()
    env.step(env.action_space.sample())
    dataset = env.get_dataset()
    states = dataset["observations"]
    actions = dataset["actions"]
    terminals = np.asarray(dataset["terminals"])
    timeouts = np.asarray(dataset.get("timeouts", np.zeros_like(terminals)))
    done_indices = np.sort(
        np.concatenate(
            [np.argwhere(terminals)[:, 0], np.argwhere(timeouts)[:, 0]]
        )
    )
    traj_lengths = np.diff(np.concatenate([[0], done_indices + 1]))
    traj_lengths = traj_lengths[traj_lengths > 0][:max_episodes]
    total = int(traj_lengths.sum())
    obs_min, obs_max = states.min(0), states.max(0)
    act_min, act_max = actions.min(0), actions.max(0)
    norm_s = 2 * (states[:total] - obs_min) / (obs_max - obs_min + 1e-6) - 1
    norm_a = 2 * (actions[:total] - act_min) / (act_max - act_min + 1e-6) - 1
    os.makedirs(save_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "train.npz"),
        states=norm_s.astype(np.float32),
        actions=norm_a.astype(np.float32),
        traj_lengths=traj_lengths,
    )
    np.savez_compressed(
        os.path.join(save_dir, save_name_prefix + "normalization.npz"),
        obs_min=obs_min,
        obs_max=obs_max,
        action_min=act_min,
        action_max=act_max,
    )
    log.info("Saved %d trajectories to %s", len(traj_lengths), save_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env_name", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--save_name_prefix", default="")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    make_dataset(args.env_name, args.save_dir, args.save_name_prefix)


if __name__ == "__main__":
    main()
