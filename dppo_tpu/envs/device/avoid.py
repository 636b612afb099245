"""D3IL-style obstacle-avoidance as a TPU-resident device task.

The reference evaluates D3IL's "avoiding" task through an external
simulator (d3il_sim, not vendored in the repo); what the repo itself pins
down is the task interface and geometry:

- observations `[robot des_c_pos_xy, robot c_pos_xy]` (4-dim) and actions =
  desired-position deltas (2-dim) — `agent/dataset/d3il_dataset/
  avoiding_dataset.py:24-34` (our `data/d3il_dataset.py AvoidingDataset`);
- six pillar obstacles in three rows and the finish line at y = 0.4 —
  `env/plot_traj.py:50-61,93-96` (`get_obj_xy_list`: mid 0.5, offset 0.075,
  first row y = -0.1, row spacing 0.18);
- episodes never terminate early and the wrapper always reports done=False
  — `env/gym_utils/wrapper/d3il_lowdim.py:4,76`;
- obs/action min-max normalization to [-1,1] from demo statistics —
  `d3il_lowdim.py:24-29,63-69`.

This module implements those semantics as a pure-JAX device task (the
simulated Franka arm is abstracted to its planar end-effector, which is all
the observation exposes): the desired position integrates the action deltas,
the actual position tracks it first-order, touching a pillar latches a
collision that freezes the robot, and crossing the finish line un-collided
pays a one-time reward of 1. Not a port of d3il_sim (whose reward shaping
and robot dynamics are external to the reference) — a documented analog on
the same interface, so the D3IL-family configs/agents exercise the fused
device path end-to-end.

`collect_avoid_demos` rolls a scripted multi-modal expert (2×2 gap choices
through the pillar rows, matching the task's multimodality story) and
writes stitched-npz demos + normalization stats; a parity test replays its
numpy rollouts through the JAX task step-for-step.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.envs.wrappers.mujoco_locomotion import (
    normalize_obs,
    unnormalize_action,
)

# geometry from the reference plotter (env/plot_traj.py:50-61)
MID, OFFSET, ROW0_Y, ROW_DY = 0.5, 0.075, -0.1, 0.18
PILLARS = np.asarray(
    [
        [MID, ROW0_Y],
        [MID - OFFSET, ROW0_Y + ROW_DY],
        [MID + OFFSET, ROW0_Y + ROW_DY],
        [MID - 2 * OFFSET, ROW0_Y + 2 * ROW_DY],
        [MID, ROW0_Y + 2 * ROW_DY],
        [MID + 2 * OFFSET, ROW0_Y + 2 * ROW_DY],
    ],
    dtype=np.float32,
)
FINISH_Y = 0.4  # env/plot_traj.py:93
WORKSPACE_LO = np.asarray([0.2, -0.3], np.float32)  # plot bounds :101-102
WORKSPACE_HI = np.asarray([0.8, 0.5], np.float32)
COLLISION_RADIUS = 0.03
TRACK_GAIN = 0.5  # first-order tracking of the desired position
MAX_DELTA = 0.02  # default per-step desired-position authority
START = np.asarray([0.5, -0.25], np.float32)
START_NOISE = np.asarray([0.05, 0.02], np.float32)


class AvoidState(NamedTuple):
    des: jnp.ndarray  # (2,) desired end-effector position
    pos: jnp.ndarray  # (2,) actual end-effector position
    passed: jnp.ndarray  # () bool — finish line already paid
    collided: jnp.ndarray  # () bool — latched collision


def _step_math(des, pos, delta):
    """Shared dynamics used by the JAX task and the numpy expert rollout.
    Returns (des', pos') ignoring the collision freeze (handled by caller).
    Works for jnp and np alike."""
    des = des + delta
    lo, hi = WORKSPACE_LO, WORKSPACE_HI
    des = jnp.clip(des, lo, hi) if isinstance(des, jnp.ndarray) else np.clip(des, lo, hi)
    pos = pos + TRACK_GAIN * (des - pos)
    return des, pos


class AvoidTask:
    """Device task with the D3IL avoiding interface (obs 4, action 2)."""

    obs_dim = 4
    action_dim = 2

    def __init__(self, normalization_path: Optional[str] = None, **kwargs):
        if normalization_path is not None:
            norm = np.load(normalization_path)
            self.obs_min = jnp.asarray(norm["obs_min"], jnp.float32)
            self.obs_max = jnp.asarray(norm["obs_max"], jnp.float32)
            self.action_min = jnp.asarray(norm["action_min"], jnp.float32)
            self.action_max = jnp.asarray(norm["action_max"], jnp.float32)
        else:
            ws_lo, ws_hi = jnp.asarray(WORKSPACE_LO), jnp.asarray(WORKSPACE_HI)
            self.obs_min = jnp.concatenate([ws_lo, ws_lo])
            self.obs_max = jnp.concatenate([ws_hi, ws_hi])
            self.action_min = jnp.asarray([-MAX_DELTA, -MAX_DELTA])
            self.action_max = jnp.asarray([MAX_DELTA, MAX_DELTA])
        self._pillars = jnp.asarray(PILLARS)

    def _obs(self, state: AvoidState) -> jnp.ndarray:
        raw = jnp.concatenate([state.des, state.pos])
        return normalize_obs(raw, self.obs_min, self.obs_max).astype(
            jnp.float32
        )

    def reset(self, rng):
        start = jnp.asarray(START) + jax.random.uniform(
            rng, (2,), minval=-1.0, maxval=1.0
        ) * jnp.asarray(START_NOISE)
        state = AvoidState(
            des=start,
            pos=start,
            passed=jnp.asarray(False),
            collided=jnp.asarray(False),
        )
        return state, self._obs(state)

    def step(self, state: AvoidState, action, rng):
        del rng  # dynamics are deterministic
        delta = unnormalize_action(action, self.action_min, self.action_max)
        des2, pos2 = _step_math(state.des, state.pos, delta)
        # collision latches and freezes the robot (no recovery, d3il-style
        # failed episode); check against the post-step position
        frozen = state.collided
        des = jnp.where(frozen, state.des, des2)
        pos = jnp.where(frozen, state.pos, pos2)
        dists = jnp.linalg.norm(pos[None, :] - self._pillars, axis=-1)
        collided = state.collided | (jnp.min(dists) < COLLISION_RADIUS)
        # one-time finish bonus, only if never collided
        crossed = (~collided) & (~state.passed) & (pos[1] >= FINISH_Y)
        reward = crossed.astype(jnp.float32)
        new_state = AvoidState(
            des=des, pos=pos, passed=state.passed | crossed, collided=collided
        )
        # the d3il wrapper never terminates early (d3il_lowdim.py:4)
        return new_state, self._obs(new_state), reward, jnp.asarray(False)


# ---------------------------------------------------------------- demos
def _expert_episode(rng: np.random.Generator, max_steps: int):
    """One scripted expert rollout in raw units. Picks one of 2×2 gap
    routes: pass row 1 left/right, cross row 2 through the centre gap,
    then row 3 through the left-centre or right-centre gap."""
    s1 = MID + rng.choice([-1.0, 1.0]) * OFFSET  # row-1 detour lane
    g3 = MID + rng.choice([-1.0, 1.0]) * OFFSET  # row-3 gap
    waypoints = np.asarray(
        [
            [s1, ROW0_Y],  # skirt the row-1 pillar
            [MID, ROW0_Y + ROW_DY],  # centre gap of row 2
            [g3, ROW0_Y + 2 * ROW_DY],  # chosen gap of row 3
            [g3, FINISH_Y + 0.05],  # over the finish line
        ],
        dtype=np.float32,
    )
    start = START + rng.uniform(-1, 1, 2).astype(np.float32) * START_NOISE
    des = start.copy()
    pos = start.copy()
    obs_list, act_list = [], []
    wp_i = 0
    speed = 0.75 * MAX_DELTA
    for _ in range(max_steps):
        target = waypoints[wp_i]
        v = target - des
        dist = float(np.linalg.norm(v))
        if dist < 0.01 and wp_i < len(waypoints) - 1:
            wp_i += 1
            target = waypoints[wp_i]
            v = target - des
            dist = float(np.linalg.norm(v))
        delta = v if dist <= speed else v / max(dist, 1e-8) * speed
        delta = delta.astype(np.float32)
        obs_list.append(np.concatenate([des, pos]).astype(np.float32))
        act_list.append(delta)
        des, pos = _step_math(des, pos, delta)
        if pos[1] >= FINISH_Y + 0.03:
            break
    return np.stack(obs_list), np.stack(act_list)


def collect_avoid_demos(
    path: str,
    norm_path: str,
    n_episodes: int = 24,
    max_steps: int = 120,
    seed: int = 0,
) -> str:
    """Scripted multi-modal expert demos for the avoid device task, in the
    stitched-npz format of `data/sequence.py` (normalized, upstream
    preprocessing-time semantics) plus normalization stats."""
    rng = np.random.default_rng(seed)
    states, actions, lengths = [], [], []
    for _ in range(n_episodes):
        s, a = _expert_episode(rng, max_steps)
        states.append(s)
        actions.append(a)
        lengths.append(len(s))
    all_s = np.concatenate(states)
    all_a = np.concatenate(actions)
    obs_min, obs_max = all_s.min(0), all_s.max(0)
    act_min = np.full(2, -MAX_DELTA, np.float32)
    act_max = np.full(2, MAX_DELTA, np.float32)
    norm_s = 2 * ((all_s - obs_min) / (obs_max - obs_min + 1e-6) - 0.5)
    norm_a = 2 * ((all_a - act_min) / (act_max - act_min + 1e-6) - 0.5)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        states=norm_s.astype(np.float32),
        actions=np.clip(norm_a, -1, 1).astype(np.float32),
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
