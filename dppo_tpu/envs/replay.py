"""Offline trajectory-replay rendering (VERDICT r3 weak #9 / next #10).

The two fast env backends trade live rendering for throughput: the
batched_mujoco pool runs headless C rollouts and the device backend never
leaves the chip. The reference can always render because every env is a
full host simulator (`wrapper/robomimic_lowdim.py:100-106` writes video
in-line). This module closes the gap offline: record the cheap state
trajectories during rollout (physics states from `mujoco.rollout` on the
batched backend — `BatchedMujocoLocomotionEnv(record_states=True)` /
`pop_recorded_states()` — or the latent obs history on device tasks) and
rasterize video AFTER the fact:

  * `render_mujoco_replay` — replays FULLPHYSICS states through a single
    host MuJoCo model + offscreen EGL renderer.
  * `render_pendulum_replay` — replays normalized pendulum observations
    through the same pure-jnp rasterizer the device pixel task uses.

Videos are written with imageio; use a .gif path on hosts without
imageio-ffmpeg (this image), .mp4 where ffmpeg is available.
"""

from __future__ import annotations

import os

# must be set before the first mujoco.Renderer is created; EGL is the
# headless-capable backend on this image
os.environ.setdefault("MUJOCO_GL", "egl")

import numpy as np


def save_state_trajectories(path: str, trajectories: list, env_name: str):
    """Persist per-env (T_i, nstate) state trajectories as one npz."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        env_name=np.asarray(env_name),
        n_envs=np.asarray(len(trajectories)),
        **{f"env_{i}": np.asarray(t) for i, t in enumerate(trajectories)},
    )
    return path


def load_state_trajectories(path: str):
    data = np.load(path)
    n = int(data["n_envs"])
    return str(data["env_name"]), [data[f"env_{i}"] for i in range(n)]


def render_mujoco_replay(
    env_name: str,
    states: np.ndarray,  # (T, nstate) FULLPHYSICS [time, qpos, qvel]
    out_path: str,
    height: int = 240,
    width: int = 320,
    fps: int = 30,
    camera=-1,
) -> str:
    """Replay recorded physics states through host MuJoCo and write video.

    Uses the same gymnasium model XML as the batched pool, so replayed
    frames are pixel-faithful to what a live renderer would have shown at
    the recorded states (rendering is a pure function of [qpos, qvel])."""
    import imageio
    import mujoco

    from dppo_tpu.envs.batched_mujoco import _TASKS, _gym_xml

    base = env_name.split("-")[0].lower()
    if base not in _TASKS:
        raise ValueError(f"no model XML known for env {env_name!r}")
    model = mujoco.MjModel.from_xml_path(_gym_xml(_TASKS[base]["xml"]))
    data = mujoco.MjData(model)
    renderer = mujoco.Renderer(model, height=height, width=width)
    states = np.asarray(states)
    nq = model.nq
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    writer = imageio.get_writer(out_path, fps=fps)
    try:
        for row in states:
            data.qpos[:] = row[1 : 1 + nq]
            data.qvel[:] = row[1 + nq : 1 + nq + model.nv]
            mujoco.mj_forward(model, data)
            renderer.update_scene(data, camera=camera)
            writer.append_data(renderer.render())
    finally:
        writer.close()
        renderer.close()
    return out_path


def render_pendulum_replay(
    obs_hist: np.ndarray,  # (T, 3) normalized [cos, sin, thdot] obs
    out_path: str,
    img_h: int = 96,
    img_w: int = 96,
    fps: int = 20,
    obs_min=None,
    obs_max=None,
) -> str:
    """Replay device-pendulum observations through the on-device rasterizer
    (`envs/device/pendulum.py render_pendulum_rgb`) and write video. Works
    for both the state task (record its obs) and the pixels/points tasks
    (record the latent hist the pool carries)."""
    import imageio
    import jax.numpy as jnp

    from dppo_tpu.envs.device.pendulum import render_pendulum_rgb

    obs_hist = np.asarray(obs_hist, np.float32)
    lo = np.asarray([-1.0, -1.0] if obs_min is None else obs_min[:2])
    hi = np.asarray([1.0, 1.0] if obs_max is None else obs_max[:2])
    cs = lo + (obs_hist[:, :2] + 1.0) * 0.5 * (hi - lo)
    frames = np.asarray(
        render_pendulum_rgb(jnp.asarray(cs), img_h, img_w)
    )  # (T, 3, H, W) [0,1]
    frames = (np.transpose(frames, (0, 2, 3, 1)) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    writer = imageio.get_writer(out_path, fps=fps)
    try:
        for f in frames:
            writer.append_data(f)
    finally:
        writer.close()
    return out_path
