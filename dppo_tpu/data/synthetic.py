"""Synthetic demonstration generators for tests and benches.

The reference framework ships datasets from Google Drive (`script/run.py:48`,
`script/download_url.py`); with zero egress we instead generate stitched-
format demos locally: (1) a generic smooth-trajectory generator matching any
(obs_dim, action_dim), and (2) a Hopper demo collector that rolls a scripted
controller in the real gymnasium MuJoCo env. Both emit the npz schema
consumed by :mod:`dppo_tpu.data.sequence` (`states`, `actions`,
`traj_lengths`, optional `rewards`/`terminals`) plus `normalization.npz`
(`obs_min`, `obs_max`, `action_min`, `action_max`).
"""

from __future__ import annotations

import os

import numpy as np


def make_synthetic_dataset(
    path: str,
    n_episodes: int = 20,
    traj_length: int = 100,
    obs_dim: int = 11,
    action_dim: int = 3,
    seed: int = 0,
    with_rewards: bool = False,
) -> str:
    """Smooth sinusoidal trajectories with action = g(state) for learnability."""
    rng = np.random.default_rng(seed)
    states, actions, rewards, terminals, lengths = [], [], [], [], []
    W = rng.normal(size=(obs_dim, action_dim)) / np.sqrt(obs_dim)
    for _ in range(n_episodes):
        phase = rng.uniform(0, 2 * np.pi, size=obs_dim)
        freq = rng.uniform(0.5, 1.5, size=obs_dim)
        t = np.arange(traj_length)[:, None]
        s = np.sin(freq[None, :] * t * 0.1 + phase[None, :]).astype(np.float32)
        a = np.tanh(s @ W).astype(np.float32)
        states.append(s)
        actions.append(a)
        if with_rewards:
            rewards.append(np.exp(-np.sum(a**2, -1)).astype(np.float32))
            term = np.zeros(traj_length, dtype=np.float32)
            term[-1] = 1.0
            terminals.append(term)
        lengths.append(traj_length)
    out = dict(
        states=np.concatenate(states),
        actions=np.concatenate(actions),
        traj_lengths=np.asarray(lengths),
    )
    if with_rewards:
        out["rewards"] = np.concatenate(rewards)
        out["terminals"] = np.concatenate(terminals)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **out)
    return path


def make_normalization(path: str, states: np.ndarray, actions: np.ndarray) -> str:
    np.savez(
        path,
        obs_min=states.min(0),
        obs_max=states.max(0),
        action_min=actions.min(0),
        action_max=actions.max(0),
    )
    return path


def collect_gym_demos(
    env_id: str,
    path: str,
    norm_path: str,
    n_episodes: int = 10,
    max_steps: int = 300,
    seed: int = 0,
) -> str:
    """Roll random-ish actions in a gymnasium env and save normalized demos.

    Not an expert policy — enough to exercise the full pretrain→finetune
    pipeline on real MuJoCo observations/dynamics.
    """
    import gymnasium

    from dppo_tpu.envs.wrappers.mujoco_locomotion import resolve_env_spec

    env_id, make_kwargs = resolve_env_spec(env_id)
    env = gymnasium.make(env_id, **make_kwargs)

    def flat(o):
        # goal-env dicts (FrankaKitchen): take the observation vector
        return np.asarray(
            o["observation"] if isinstance(o, dict) else o, dtype=np.float32
        )

    rng = np.random.default_rng(seed)
    # explore the env's full action authority (e.g. Pendulum torque is ±2,
    # the MuJoCo locomotion tasks are ±1); bounded spaces only
    act_scale = np.where(
        np.isfinite(env.action_space.high), env.action_space.high, 1.0
    ).astype(np.float32)
    states, actions, rewards, terminals, lengths = [], [], [], [], []
    for ep in range(n_episodes):
        obs, _ = env.reset(seed=seed + ep)
        ep_s, ep_a, ep_r, ep_t = [], [], [], []
        prev_a = np.zeros(env.action_space.shape, dtype=np.float32)
        for _ in range(max_steps):
            a = np.clip(
                0.8 * prev_a + 0.4 * rng.standard_normal(env.action_space.shape),
                -1,
                1,
            ).astype(np.float32)
            ep_s.append(flat(obs))
            ep_a.append(a * act_scale)
            obs, r, term, trunc, _ = env.step(a * act_scale)
            ep_r.append(np.float32(r))
            ep_t.append(bool(term))
            prev_a = a
            if term or trunc:
                break
        states.append(np.stack(ep_s))
        actions.append(np.stack(ep_a))
        rewards.append(np.asarray(ep_r, np.float32))
        terminals.append(np.asarray(ep_t, bool))
        lengths.append(len(ep_s))
    env.close()
    all_s = np.concatenate(states)
    all_a = np.concatenate(actions)
    obs_min, obs_max = all_s.min(0), all_s.max(0)
    act_min, act_max = all_a.min(0) - 1e-3, all_a.max(0) + 1e-3
    norm_s = 2 * ((all_s - obs_min) / (obs_max - obs_min + 1e-6) - 0.5)
    norm_a = 2 * ((all_a - act_min) / (act_max - act_min + 1e-6) - 0.5)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        states=norm_s.astype(np.float32),
        actions=norm_a.astype(np.float32),
        # rewards/terminals make the set loadable as a Q-learning dataset
        # (Cal-QL/RLPD offline mixing), matching the d4rl converter output
        rewards=np.concatenate(rewards),
        terminals=np.concatenate(terminals),
        traj_lengths=np.asarray(lengths),
    )
    np.savez(
        norm_path,
        obs_min=obs_min,
        obs_max=obs_max,
        action_min=act_min,
        action_max=act_max,
    )
    return path


def collect_pendulum_pixel_demos(
    path: str,
    n_episodes: int = 25,
    max_steps: int = 200,
    img_h: int = 48,
    img_w: int = 48,
    seed: int = 0,
) -> str:
    """Random-walk pendulum demos for the PIXEL task: the npz carries the
    rendered frames (`images`, float32 [0,1], the same pure-jnp rasterizer
    the device env uses — `envs/device/pendulum.py render_pendulum_rgb`)
    plus the proprio `states` (normalized angular velocity ONLY, matching
    `PendulumPixelsTask.split_obs`) and canonically normalized `actions`.
    Feeds the img pretrain pipeline
    (cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img.yaml)."""
    import gymnasium
    import jax.numpy as jnp

    from dppo_tpu.envs.device.pendulum import render_pendulum_rgb

    env = gymnasium.make("Pendulum-v1")
    rng = np.random.default_rng(seed)
    max_speed, max_torque = 8.0, 2.0
    states, actions, images, lengths = [], [], [], []
    for ep in range(n_episodes):
        obs, _ = env.reset(seed=seed + ep)
        ep_s, ep_a, ep_i = [], [], []
        prev_a = np.zeros((1,), np.float32)
        for _ in range(max_steps):
            a = np.clip(
                0.8 * prev_a + 0.4 * rng.standard_normal((1,)), -1, 1
            ).astype(np.float32)
            cos, sin, thdot = np.asarray(obs, np.float32)
            ep_s.append(np.asarray([thdot / max_speed], np.float32))
            ep_i.append(
                np.asarray(
                    render_pendulum_rgb(
                        jnp.asarray([cos, sin]), img_h, img_w
                    ),
                    np.float32,
                )
            )
            ep_a.append(a)  # already in [-1, 1] (canonical torque norm)
            obs, _, term, trunc, _ = env.step(a * max_torque)
            prev_a = a
            if term or trunc:
                break
        states.append(np.stack(ep_s))
        actions.append(np.stack(ep_a))
        images.append(np.stack(ep_i))
        lengths.append(len(ep_s))
    env.close()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        states=np.concatenate(states),
        actions=np.concatenate(actions),
        images=np.concatenate(images),
        traj_lengths=np.asarray(lengths),
    )
    return path

def collect_pendulum_point_demos(
    path: str,
    n_episodes: int = 25,
    max_steps: int = 200,
    n_rod: int = 24,
    n_pad: int = 8,
    seed: int = 0,
) -> str:
    """Random-walk pendulum demos for the POINT-CLOUD task: the npz carries
    per-step clouds (`points`, float32 (T, 1, L, 3) — one frame of rod
    points with zero back-padding, the same pure-jnp sampler the device env
    uses, `envs/device/pendulum.py sample_pendulum_points`) plus the
    proprio `states` (normalized angular velocity ONLY, matching
    `PendulumPointsTask.split_obs`) and canonically normalized `actions`.
    Feeds the point pretrain pipeline (use_point datasets,
    `data/sequence.py:92`)."""
    import gymnasium
    import jax.numpy as jnp

    from dppo_tpu.envs.device.pendulum import sample_pendulum_points

    env = gymnasium.make("Pendulum-v1")
    rng = np.random.default_rng(seed)
    max_speed, max_torque = 8.0, 2.0
    states, actions, points, lengths = [], [], [], []
    for ep in range(n_episodes):
        obs, _ = env.reset(seed=seed + ep)
        ep_s, ep_a, ep_p = [], [], []
        prev_a = np.zeros((1,), np.float32)
        for _ in range(max_steps):
            a = np.clip(
                0.8 * prev_a + 0.4 * rng.standard_normal((1,)), -1, 1
            ).astype(np.float32)
            cos, sin, thdot = np.asarray(obs, np.float32)
            ep_s.append(np.asarray([thdot / max_speed], np.float32))
            ep_p.append(
                np.asarray(
                    sample_pendulum_points(
                        jnp.asarray([cos, sin]), n_rod, n_pad
                    ),
                    np.float32,
                )[None]  # (1, L, 3) single frame
            )
            ep_a.append(a)
            obs, _, term, trunc, _ = env.step(a * max_torque)
            prev_a = a
            if term or trunc:
                break
        states.append(np.stack(ep_s))
        actions.append(np.stack(ep_a))
        points.append(np.stack(ep_p))
        lengths.append(len(ep_s))
    env.close()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        states=np.concatenate(states),
        actions=np.concatenate(actions),
        points=np.concatenate(points),
        traj_lengths=np.asarray(lengths),
    )
    return path
