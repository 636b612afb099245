"""Convert raw D3IL demonstration pickles into the stitched npz format.

Parity with `script/dataset/process_d3il_dataset.py:20-297`: per-task
loader dims (align/avoid/push/sort/stack), global obs/action min-max
computed over valid transitions, everything scaled to [-1, 1], trajectories
split into train/val *by trajectory*, and three outputs written:
`<prefix>train.npz`, `<prefix>val.npz` (states/actions/rewards/
traj_lengths; rewards are zeros — D3IL demos carry none) and
`<prefix>normalization.npz` (obs/action min/max). For the avoid task a
trajectory overview plot is saved like the reference's `plot()`.

Deviation: the split is seeded (`--seed`) instead of using the global
unseeded RNG, so conversions are reproducible.

Usage:
    python -m dppo_tpu.scripts.process_d3il_dataset \
        --load_path /path/to/d3il/avoiding/data --save_dir $DPPO_DATA_DIR \
        --env_type avoid --val_split 0.2
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from dppo_tpu.data.d3il_dataset import TASK_SPECS

log = logging.getLogger("process_d3il_dataset")


def make_dataset(load_path, save_dir, save_name_prefix, env_type,
                 val_split, seed=42):
    if env_type not in TASK_SPECS:
        raise ValueError(
            f"env_type must be one of {sorted(TASK_SPECS)}, got {env_type!r}"
        )
    spec = dict(TASK_SPECS[env_type])
    cls = spec.pop("cls")
    ds = cls(load_path, **spec)

    traj_lengths = np.array(
        [ds.get_seq_length(i) for i in range(ds.num_data)]
    )
    obs_all = ds.get_all_observations()
    action_all = ds.get_all_actions()
    obs_min, obs_max = obs_all.min(0), obs_all.max(0)
    action_min, action_max = action_all.min(0), action_all.max(0)
    log.info("total transitions: %d over %d trajectories",
             traj_lengths.sum(), len(traj_lengths))
    log.info("traj length mean/std: %.1f / %.1f; min/max: %d / %d",
             traj_lengths.mean(), traj_lengths.std(),
             traj_lengths.min(), traj_lengths.max())
    log.info("obs min %s max %s", obs_min, obs_max)
    log.info("action min %s max %s", action_min, action_max)

    num_traj = len(traj_lengths)
    num_train = int(num_traj * (1 - val_split))
    rng = np.random.default_rng(seed)
    train_indices = set(
        rng.choice(num_traj, size=num_train, replace=False).tolist()
    )

    out = {
        split: {"states": [], "actions": [], "rewards": [], "traj_lengths": []}
        for split in ("train", "val")
    }
    for i in range(num_traj):
        split = "train" if i in train_indices else "val"
        T = int(traj_lengths[i])
        obs_traj = ds.observations[i, :T]
        action_traj = ds.actions[i, :T]
        obs_traj = 2 * (obs_traj - obs_min) / (obs_max - obs_min + 1e-6) - 1
        action_traj = (
            2 * (action_traj - action_min) / (action_max - action_min + 1e-6)
            - 1
        )
        out[split]["states"].append(obs_traj)
        out[split]["actions"].append(action_traj)
        out[split]["rewards"].append(np.zeros(T, np.float32))
        out[split]["traj_lengths"].append(T)

    os.makedirs(save_dir, exist_ok=True)
    for split in ("train", "val"):
        o = out[split]
        if not o["traj_lengths"]:
            if split == "val" and val_split == 0:
                continue
            raise ValueError(f"{split} split is empty")
        path = os.path.join(save_dir, f"{save_name_prefix}{split}.npz")
        np.savez_compressed(
            path,
            states=np.concatenate(o["states"]).astype(np.float32),
            actions=np.concatenate(o["actions"]).astype(np.float32),
            rewards=np.concatenate(o["rewards"]),
            traj_lengths=np.asarray(o["traj_lengths"]),
        )
        log.info("%s: %d episodes, %d transitions -> %s", split,
                 len(o["traj_lengths"]), int(np.sum(o["traj_lengths"])), path)
    np.savez(
        os.path.join(save_dir, f"{save_name_prefix}normalization.npz"),
        obs_min=obs_min,
        obs_max=obs_max,
        action_min=action_min,
        action_max=action_max,
    )

    if env_type == "avoid":
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from dppo_tpu.envs.plot_traj import _avoid_pillar_xys

            for split in ("train", "val"):
                o = out[split]
                if not o["traj_lengths"]:
                    continue
                states = np.concatenate(o["states"])
                fig = plt.figure()
                prev = 0
                for T in o["traj_lengths"]:
                    traj = (states[prev : prev + T] + 1) / 2
                    traj = traj * (obs_max - obs_min) + obs_min
                    plt.plot(traj[:, 2], traj[:, 3], color=(0.3, 0.3, 0.3))
                    prev += T
                plt.axhline(y=0.4, linestyle="-")
                for xy in _avoid_pillar_xys():
                    plt.gca().add_patch(
                        plt.Circle(xy, 0.01, color="k", fill=True)
                    )
                plt.xlim(0.2, 0.8)
                plt.ylim(-0.3, 0.5)
                plt.gca().set_aspect("equal", adjustable="box")
                plt.savefig(os.path.join(save_dir, f"{split}-trajs.png"))
                plt.close(fig)
        except Exception as e:  # plotting is best-effort
            log.warning("trajectory plot skipped: %s", e)
    return traj_lengths


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_path", type=str, required=True)
    parser.add_argument("--save_dir", type=str, default=".")
    parser.add_argument("--save_name_prefix", type=str, default="")
    parser.add_argument("--env_type", type=str, default="align",
                        choices=sorted(TASK_SPECS))
    parser.add_argument("--val_split", type=float, default=0.2)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)
    make_dataset(args.load_path, args.save_dir, args.save_name_prefix,
                 args.env_type, args.val_split, args.seed)


if __name__ == "__main__":
    main()
