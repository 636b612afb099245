"""D3IL trajectory plotting (parity: `env/plot_traj.py:12` TrajPlotter).

Renders end-effector XY traces over the avoid-task pillar layout (or a
generic scatter for other env types) to PNGs in the render directory.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np


class TrajPlotter:
    def __init__(self, env_type: str, **kwargs):
        if env_type == "avoid":
            self.save_traj = partial(save_avoid_traj, **kwargs)
        elif env_type == "toy":
            self.save_traj = save_toy_traj
        else:
            self.save_traj = _dummy

    def __call__(self, **kwargs):
        self.save_traj(**kwargs)


def _dummy(*args, **kwargs):
    pass


def _avoid_pillar_xys():
    mid_pos, offset = 0.5, 0.075
    first_level_y, level_distance = -0.1, 0.18
    return [
        [mid_pos, first_level_y],
        [mid_pos - offset, first_level_y + level_distance],
        [mid_pos + offset, first_level_y + level_distance],
        [mid_pos - 2 * offset, first_level_y + 2 * level_distance],
        [mid_pos, first_level_y + 2 * level_distance],
        [mid_pos + 2 * offset, first_level_y + 2 * level_distance],
    ]


def save_avoid_traj(
    obs_full_trajs,
    n_render,
    max_episode_steps,
    render_dir,
    itr,
    normalization_path,
    **kwargs,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    norm = np.load(normalization_path)
    obs_min, obs_max = norm["obs_min"], norm["obs_max"]

    def unnormalize_obs(obs):
        obs = (obs + 1) / 2
        return obs * (obs_max - obs_min) + obs_min

    chosen = np.random.choice(
        range(obs_full_trajs.shape[1]), n_render, replace=False
    )
    fig = plt.figure()
    for i in chosen:
        traj = unnormalize_obs(obs_full_trajs[:max_episode_steps, i, :])
        plt.scatter(traj[:, 0], traj[:, 1], marker="o", s=6)
    for xy in _avoid_pillar_xys():
        plt.scatter(xy[0], xy[1], marker="x", color="k", s=60)
    plt.xlim(0.2, 0.8)
    plt.ylim(-0.3, 0.5)
    os.makedirs(render_dir, exist_ok=True)
    plt.savefig(os.path.join(render_dir, f"itr-{itr}_trajs.png"))
    plt.close(fig)


def save_toy_traj(
    obs_full_trajs, n_render, max_episode_steps, render_dir, itr, **kwargs
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    chosen = np.random.choice(
        range(obs_full_trajs.shape[1]), n_render, replace=False
    )
    fig = plt.figure()
    for i in chosen:
        traj = obs_full_trajs[:max_episode_steps, i, :]
        plt.plot(traj[:, 0], traj[:, 1])
    os.makedirs(render_dir, exist_ok=True)
    plt.savefig(os.path.join(render_dir, f"itr-{itr}_trajs.png"))
    plt.close(fig)
