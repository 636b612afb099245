"""Host-API adapter over a DevicePool.

Exposes the standard venv interface (`seed, reset_arg, reset_one_arg, step,
step_async/step_wait, close` — the surface every pool/backend must keep, cf
`async_vector_env.py:663-708`) so any existing agent can drive a
TPU-resident env without code changes: each `step` is one jitted
`DevicePool.step_chunk` dispatch. `step_async` exploits JAX's asynchronous
dispatch — the program is enqueued immediately and `step_wait` materializes
the results — so the split-phase overlap the agents rely on works here too.

Agents that want the fully fused path (rollout + update in one XLA program)
bypass this adapter and consume `.pool` / `.pool_state` directly
(`agents/finetune_ppo_diffusion_device.py`).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.envs.device.core import DevicePool

log = logging.getLogger(__name__)


class DeviceVectorEnv:
    def __init__(
        self,
        task,
        n_envs: int,
        n_obs_steps: int = 1,
        n_action_steps: int = 1,
        max_episode_steps: Optional[int] = None,
        reset_within_step: bool = False,
        seed: int = 0,
    ):
        self.pool = DevicePool(
            task,
            n_envs,
            n_obs_steps=n_obs_steps,
            n_action_steps=n_action_steps,
            max_episode_steps=max_episode_steps,
            reset_within_step=reset_within_step,
        )
        self.n_envs = int(n_envs)
        self._seeds = [seed + i for i in range(self.n_envs)]
        self._seeds_dirty = True
        self.pool_state = None
        self._pending = None
        self._warned_video = False
        self._jit_reset_all = jax.jit(self.pool.reset_all)
        self._jit_step = jax.jit(self.pool.step_chunk)
        self._jit_reset_where = jax.jit(self.pool.reset_where)

    # ------------------------------------------------------------ venv API
    def seed(self, seeds: Sequence[int]):
        assert len(seeds) == self.n_envs
        self._seeds = [int(s) for s in seeds]
        self._seeds_dirty = True

    def _keys_from_seeds(self):
        return jax.vmap(jax.random.key)(jnp.asarray(self._seeds, jnp.uint32))

    def reset_arg(self, options_list: Optional[Sequence[dict]] = None):
        if self._pending is not None:
            raise RuntimeError("cannot reset while a step_async is pending")
        if options_list is not None and not self._warned_video:
            if any("video_path" in (o or {}) for o in options_list):
                log.warning(
                    "device env backend does not record video; "
                    "video_path options ignored"
                )
                self._warned_video = True
        if self._seeds_dirty:
            self.pool_state = self._jit_reset_all(self._keys_from_seeds())
            self._seeds_dirty = False
        else:
            self.pool_state = self._jit_reset_all(self.pool_state.rng)
        return self._obs_np(self.pool_state.hist)

    def _obs_np(self, hist) -> dict:
        """Observation dict for the venv API: tasks with a `split_obs`
        (on-device pixel rendering) expose their modalities, others the
        plain state history."""
        task = self.pool.task
        if hasattr(task, "split_obs"):
            return {
                k: np.asarray(v) for k, v in task.split_obs(hist).items()
            }
        return {"state": np.asarray(hist)}

    def reset(self):
        return self.reset_arg()

    def reset_one_arg(self, env_ind: int, options: Optional[dict] = None):
        mask = jnp.zeros((self.n_envs,), bool).at[env_ind].set(True)
        self.pool_state = self._jit_reset_where(self.pool_state, mask)
        # slice to the one env BEFORE building the obs dict — split_obs on
        # pixel tasks rasterizes frames for every env it is given
        one = self._obs_np(self.pool_state.hist[env_ind : env_ind + 1])
        return {k: v[0] for k, v in one.items()}

    def step(self, actions: np.ndarray):
        if self._pending is not None:
            raise RuntimeError("cannot step while a step_async is pending")
        self.step_async(actions)
        return self.step_wait()

    def step_async(self, actions: np.ndarray):
        if self._pending is not None:
            raise RuntimeError("step_async called with a step already pending")
        if self.pool_state is None:
            raise RuntimeError("step before reset")
        actions = jnp.asarray(actions, jnp.float32)
        # JAX dispatch is async: this enqueues the XLA program and returns
        self._pending = self._jit_step(self.pool_state, actions)

    def step_wait(self):
        if self._pending is None:
            raise RuntimeError("step_wait called without a pending step_async")
        self.pool_state, out = self._pending
        self._pending = None
        obs = self._obs_np(out.obs)
        reward = np.asarray(out.reward)
        terminated = np.asarray(out.terminated)
        truncated = np.asarray(out.truncated)
        infos = [{} for _ in range(self.n_envs)]
        if self.pool.reset_within_step and truncated.any():
            final = self._obs_np(out.final_obs)
            for i in np.nonzero(truncated)[0]:
                infos[i]["final_obs"] = {k: v[i] for k, v in final.items()}
        return obs, reward, terminated, truncated, infos

    def call_sync(self, name: str, *args, **kwargs):
        raise AttributeError(
            f"device env backend has no per-env method {name!r}"
        )

    def render(self):
        raise NotImplementedError("device env backend does not render")

    def close(self):
        self._pending = None
