"""Single-process batched MuJoCo locomotion env pool on the native threaded
``mujoco.rollout`` C module.

This is the TPU-host answer to the reference's one-OS-process-per-env fabric
(`env/gym_utils/async_vector_env.py:56`): instead of N processes exchanging
pickled observations over pipes, ONE process holds N physics states and each
macro (action-chunk) step is a single call into MuJoCo's multi-threaded C
rollout — `n_action_steps × frame_skip` sim steps for all envs at once, no
Python in the inner loop. Rewards, terminations, observation histories, and
in-pool resets are computed vectorized in numpy afterwards.

It fuses four layers of the reference stack into one object while preserving
their exact semantics:
  raw gym sim            → threaded `mujoco.rollout` over shared MjModel
  task wrapper           → vectorized obs min/max→[-1,1] normalize, action
                           unnormalize (`wrapper/mujoco_locomotion_lowdim.py:12`)
  MultiStep              → chunk execution with early break on termination,
                           reward sum, obs history, episode-step budget,
                           in-pool reset + `final_obs` (`wrapper/multi_step.py:82`)
  As/SyncVectorEnv       → the venv API (`seed`, `reset_arg`, `reset_one_arg`,
                           `step`, `step_async/step_wait`, `close`)

Reset sampling is bit-identical to gymnasium's (same `default_rng(seed)`
PCG64 stream, same draw order), and stepping is bit-identical to
``gymnasium.envs.mujoco.*_v4`` when solver warmstarting is disabled; with
warmstarting on (default), warmstarts are zeroed at each macro-step boundary
instead of carried — a deterministic, equally-valid physics trajectory
(gymnasium carries them across steps; MuJoCo treats warmstart as a pure
solver accelerant).

`step_async` runs the rollout on a background thread (the C rollout releases
the GIL), so the caller can overlap device→host transfers and buffer writes
with physics — same overlap the process pool provides, without the IPC.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_GYM_ASSETS = None


def _gym_xml(name: str) -> str:
    global _GYM_ASSETS
    if _GYM_ASSETS is None:
        import gymnasium.envs.mujoco as m

        _GYM_ASSETS = os.path.join(os.path.dirname(m.__file__), "assets")
    return os.path.join(_GYM_ASSETS, name)


def _hopper_terminated(qpos: np.ndarray, qvel: np.ndarray) -> np.ndarray:
    # gymnasium hopper_v4.py:101-115 — healthy iff z>0.7, |angle|<0.2, and
    # every entry of state_vector()[2:] (qpos[2:] + UNclipped qvel) in ±100
    z, ang = qpos[..., 1], qpos[..., 2]
    sv = np.concatenate([qpos[..., 2:], qvel], axis=-1)
    healthy = (
        np.all(np.abs(sv) < 100.0, axis=-1)
        & (z > 0.7)
        & (ang > -0.2)
        & (ang < 0.2)
    )
    return ~healthy


def _walker2d_terminated(qpos: np.ndarray, qvel: np.ndarray) -> np.ndarray:
    # gymnasium walker2d_v4.py:97-107
    z, ang = qpos[..., 1], qpos[..., 2]
    healthy = (z > 0.8) & (z < 2.0) & (ang > -1.0) & (ang < 1.0)
    return ~healthy


def _never_terminated(qpos: np.ndarray, qvel: np.ndarray) -> np.ndarray:
    return np.zeros(qpos.shape[:-1], dtype=bool)


# constants lifted from gymnasium.envs.mujoco.{hopper,walker2d,half_cheetah}_v4
_TASKS = {
    "hopper": dict(
        xml="hopper.xml", frame_skip=4, ctrl_cost=1e-3, forward_w=1.0,
        healthy_reward=1.0, clip_qvel=10.0, reset_noise=5e-3,
        reset_qvel="uniform", terminated=_hopper_terminated,
    ),
    "walker2d": dict(
        xml="walker2d.xml", frame_skip=4, ctrl_cost=1e-3, forward_w=1.0,
        healthy_reward=1.0, clip_qvel=10.0, reset_noise=5e-3,
        reset_qvel="uniform", terminated=_walker2d_terminated,
    ),
    "halfcheetah": dict(
        xml="half_cheetah.xml", frame_skip=5, ctrl_cost=0.1, forward_w=1.0,
        healthy_reward=0.0, clip_qvel=None, reset_noise=0.1,
        reset_qvel="normal", terminated=_never_terminated,
    ),
}


class BatchedMujocoLocomotionEnv:
    """Drop-in venv (same API as As/SyncVectorEnv wrapping MultiStep) for the
    gym locomotion tasks, backed by one threaded C rollout per macro step."""

    def __init__(
        self,
        env_name: str,
        n_envs: int,
        normalization_path: str,
        n_obs_steps: int = 1,
        n_action_steps: int = 4,
        max_episode_steps: Optional[int] = 1000,
        reset_within_step: bool = True,
        nthread: Optional[int] = None,
        disable_warmstart: bool = False,
        record_states: bool = False,
    ):
        import mujoco

        base = env_name.split("-")[0].lower()
        if base not in _TASKS:
            raise ValueError(
                f"batched backend supports {sorted(_TASKS)}, got {env_name!r}"
            )
        self.task = _TASKS[base]
        self.model = mujoco.MjModel.from_xml_path(_gym_xml(self.task["xml"]))
        if disable_warmstart:
            self.model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
        self._disable_warmstart = disable_warmstart
        self.nq, self.nv, self.nu = self.model.nq, self.model.nv, self.model.nu
        self.frame_skip = self.task["frame_skip"]
        self.dt = self.model.opt.timestep * self.frame_skip
        self.obs_dim = self.nq - 1 + self.nv  # x excluded, v4 convention
        self.n_envs = int(n_envs)
        self.n_obs_steps = int(n_obs_steps)
        self.n_action_steps = int(n_action_steps)
        self.max_episode_steps = (
            None if max_episode_steps is None else int(max_episode_steps)
        )
        self.reset_within_step = bool(reset_within_step)

        norm = np.load(normalization_path)
        self.obs_min = norm["obs_min"].astype(np.float64)
        self.obs_max = norm["obs_max"].astype(np.float64)
        self.action_min = norm["action_min"].astype(np.float64)
        self.action_max = norm["action_max"].astype(np.float64)

        nthread = min(nthread or (os.cpu_count() or 1), self.n_envs)
        self._datas = [mujoco.MjData(self.model) for _ in range(nthread)]
        self._mujoco = mujoco
        self._nstate = mujoco.mj_stateSize(
            self.model, mujoco.mjtState.mjSTATE_FULLPHYSICS.value
        )
        self._init_qpos = np.array(self._datas[0].qpos)  # model qpos0
        self._init_qvel = np.zeros(self.nv)

        self._qpos = np.tile(self._init_qpos, (self.n_envs, 1))
        self._qvel = np.zeros((self.n_envs, self.nv))
        self._time = np.zeros(self.n_envs)
        self._cnt = np.zeros(self.n_envs, dtype=np.int64)
        self._hist = np.zeros(
            (self.n_envs, self.n_obs_steps, self.obs_dim), np.float32
        )
        self._rngs = [np.random.default_rng(i) for i in range(self.n_envs)]
        self._pending_seed: list = [None] * self.n_envs
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = None
        self._warned_video = False
        # opt-in replay recording: per-env executed FULLPHYSICS states at
        # env-step granularity, rendered post-hoc by envs/replay.py (the
        # offline counterpart of the process backend's live video writer)
        self.record_states = bool(record_states)
        self._recorded: list[list[np.ndarray]] = [
            [] for _ in range(self.n_envs)
        ]

    # ------------------------------------------------------------- helpers
    def _normalize_obs(self, raw: np.ndarray) -> np.ndarray:
        from dppo_tpu.envs.wrappers.mujoco_locomotion import normalize_obs

        return normalize_obs(raw, self.obs_min, self.obs_max).astype(
            np.float32
        )

    def _unnormalize_action(self, a: np.ndarray) -> np.ndarray:
        from dppo_tpu.envs.wrappers.mujoco_locomotion import (
            unnormalize_action,
        )

        return unnormalize_action(a, self.action_min, self.action_max)

    def _raw_obs(self, qpos: np.ndarray, qvel: np.ndarray) -> np.ndarray:
        if self.task["clip_qvel"] is not None:
            c = self.task["clip_qvel"]
            qvel = np.clip(qvel, -c, c)
        return np.concatenate([qpos[..., 1:], qvel], axis=-1)

    def _reset_state(self, idx: np.ndarray):
        """Sample fresh initial states for envs `idx` — bit-identical draws
        to gymnasium's reset_model (same generator, same order)."""
        noise = self.task["reset_noise"]
        for i in idx:
            rng = self._rngs[i]
            if self._pending_seed[i] is not None:
                rng = np.random.default_rng(self._pending_seed[i])
                self._rngs[i] = rng
                self._pending_seed[i] = self._pending_seed[i] + 1
            self._qpos[i] = self._init_qpos + rng.uniform(
                -noise, noise, size=self.nq
            )
            if self.task["reset_qvel"] == "uniform":
                self._qvel[i] = self._init_qvel + rng.uniform(
                    -noise, noise, size=self.nv
                )
            else:  # halfcheetah: init_qvel + noise_scale * N(0,1)
                self._qvel[i] = (
                    self._init_qvel + noise * rng.standard_normal(self.nv)
                )
            self._time[i] = 0.0
            self._cnt[i] = 0
        obs = self._normalize_obs(self._raw_obs(self._qpos[idx], self._qvel[idx]))
        self._hist[idx] = obs[:, None, :]  # edge-pad the whole history

    def _stacked(self, idx=None) -> dict:
        h = self._hist if idx is None else self._hist[idx]
        return {"state": h.copy()}

    # ----------------------------------------------------------- venv API
    def seed(self, seeds: Sequence[int]):
        assert len(seeds) == self.n_envs
        self._pending_seed = [int(s) for s in seeds]

    def reset_arg(self, options_list: Optional[Sequence[dict]] = None):
        if self._pending is not None:
            raise RuntimeError("cannot reset while a step_async is pending")
        if options_list is not None and not self._warned_video:
            if any("video_path" in (o or {}) for o in options_list):
                log.warning(
                    "batched_mujoco backend does not record video; "
                    "video_path options ignored"
                )
                self._warned_video = True
        self._reset_state(np.arange(self.n_envs))
        return self._stacked()

    def reset(self):
        return self.reset_arg()

    def reset_one_arg(self, env_ind: int, options: Optional[dict] = None):
        self._reset_state(np.array([env_ind]))
        return {"state": self._hist[env_ind].copy()}

    def step(self, actions: np.ndarray):
        if self._pending is not None:
            raise RuntimeError("cannot step while a step_async is pending")
        return self._step_impl(np.asarray(actions))

    def step_async(self, actions: np.ndarray):
        if self._pending is not None:
            raise RuntimeError("step_async called with a step already pending")
        self._pending = self._pool.submit(self._step_impl, np.asarray(actions))

    def step_wait(self):
        if self._pending is None:
            raise RuntimeError("step_wait called without a pending step_async")
        out = self._pending.result()
        self._pending = None
        return out

    def call_sync(self, name: str, *args, **kwargs):
        raise AttributeError(
            f"batched_mujoco backend has no per-env method {name!r}"
        )

    def pop_recorded_states(self) -> list:
        """Per-env executed state trajectories recorded since the last call:
        a list of (T_i, nstate) FULLPHYSICS arrays ([time, qpos, qvel]),
        ready for `dppo_tpu.envs.replay.render_mujoco_replay`. Requires
        `record_states=True`."""
        out = [
            np.concatenate(ep, axis=0) if ep else np.zeros((0, self._nstate))
            for ep in self._recorded
        ]
        self._recorded = [[] for _ in range(self.n_envs)]
        return out

    def render(self):
        raise NotImplementedError(
            "batched_mujoco backend has no live render; use "
            "record_states=True + dppo_tpu.envs.replay.render_mujoco_replay "
            "for offline video"
        )

    def close(self):
        self._pool.shutdown(wait=False)

    # ------------------------------------------------------------ stepping
    def _step_impl(self, actions: np.ndarray):
        """actions: (N, S, Da) normalized chunk. One C rollout call, then
        vectorized MultiStep bookkeeping."""
        from mujoco import rollout

        N, S = actions.shape[0], actions.shape[1]
        F = self.frame_skip
        raw_act = self._unnormalize_action(actions.astype(np.float64))
        # mj_step clamps ctrl to the actuator range internally; gymnasium's
        # ctrl cost uses the UNclamped action (hopper_v4.py:96-98)
        ctrl = np.repeat(raw_act, F, axis=1)  # (N, S*F, nu)

        init = np.concatenate(
            [self._time[:, None], self._qpos, self._qvel], axis=1
        )  # mjSTATE_FULLPHYSICS (na == 0 for these models)
        state = np.empty((N, S * F, self._nstate))
        warmstart = None
        if not self._disable_warmstart:
            # zeroed each macro step: deterministic regardless of which data
            # slot (thread) an env lands on. See module docstring.
            warmstart = np.zeros((N, self.nv))
        # skip_checks bypasses the wrapper's input tiling: model must be a
        # length-nbatch list and every array fully-shaped float64
        rollout.rollout(
            [self.model] * N,
            self._datas,
            init,
            ctrl,
            nstep=S * F,
            initial_warmstart=warmstart,
            state=state,
            skip_checks=True,
            persistent_pool=True,
        )

        # block-boundary states: after each group of frame_skip sim steps
        bound = state[:, F - 1 :: F, :]  # (N, S, nstate)
        qpos_b = bound[:, :, 1 : 1 + self.nq]
        qvel_b = bound[:, :, 1 + self.nq :]
        x_after = qpos_b[:, :, 0]
        x_before = np.concatenate([self._qpos[:, :1], x_after[:, :-1]], axis=1)
        x_vel = (x_after - x_before) / self.dt
        ctrl_cost = self.task["ctrl_cost"] * np.sum(raw_act**2, axis=-1)
        r_block = (
            self.task["healthy_reward"]
            + self.task["forward_w"] * x_vel
            - ctrl_cost
        )  # (N, S)
        term_block = self.task["terminated"](qpos_b, qvel_b)  # (N, S)

        # MultiStep loop semantics (multi_step.py:81-95), vectorized:
        # execute blocks until the first termination (inclusive) or until the
        # episode-step budget hits (termination checked first on ties).
        any_term = term_block.any(axis=1)
        first_term = np.where(any_term, term_block.argmax(axis=1) + 1, S + 1)
        if self.max_episode_steps is not None:
            trunc_at = np.maximum(self.max_episode_steps - self._cnt, 1)
        else:
            trunc_at = np.full(N, S + 1, dtype=np.int64)
        executed = np.minimum(np.minimum(first_term, trunc_at), S)
        terminated = first_term <= np.minimum(trunc_at, S)
        truncated = (~terminated) & (trunc_at <= S)
        block_mask = np.arange(S)[None, :] < executed[:, None]
        reward = np.sum(r_block * block_mask, axis=1).astype(np.float32)
        self._cnt += executed

        if self.record_states:
            for i in range(N):
                self._recorded[i].append(bound[i, : executed[i]].copy())

        # advance physics state to the last executed block
        last = executed - 1
        ar = np.arange(N)
        self._qpos = qpos_b[ar, last].copy()
        self._qvel = qvel_b[ar, last].copy()
        self._time = bound[ar, last, 0].copy()

        # observation history: push every executed substep's obs
        obs_b = self._normalize_obs(self._raw_obs(qpos_b, qvel_b))  # (N,S,Do)
        To = self.n_obs_steps
        combined = np.concatenate([self._hist, obs_b], axis=1)  # (N, To+S, Do)
        take = executed[:, None] + np.arange(To)[None, :]  # last To ≤ index To+executed-1
        self._hist = np.take_along_axis(
            combined, take[:, :, None].astype(np.int64), axis=1
        )

        infos = [{} for _ in range(N)]
        done = terminated | truncated
        if self.reset_within_step and done.any():
            idx = np.nonzero(done)[0]
            pre = self._hist[idx].copy()
            for j, i in enumerate(idx):
                if truncated[i]:
                    infos[i]["final_obs"] = {"state": pre[j]}
            self._reset_state(idx)
        return (
            self._stacked(),
            reward,
            terminated,
            truncated & ~terminated,
            infos,
        )


def supports_batched_backend(env_name: str) -> bool:
    return env_name.split("-")[0].lower() in _TASKS
