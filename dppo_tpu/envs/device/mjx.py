"""MuJoCo-MJX locomotion device tasks (gated on mujoco-mjx).

The TPU-pure answer to the reference's GPU-batched IsaacGym branch
(`env/gym_utils/__init__.py:73-108`, SURVEY §2.9): physics itself compiled
by XLA and co-resident with the learner, so the full gym locomotion
benchmark family runs with ZERO host↔device traffic when driven through
the fused rollout (`agents/finetune_ppo_diffusion_device.py`).

Task constants (frame_skip, reward terms, reset noise, termination rules)
are shared with the host `batched_mujoco` backend, which lifted them from
`gymnasium.envs.mujoco.{hopper,walker2d,half_cheetah}_v4` — the same sims
the reference trains on via d4rl env names.

mujoco-mjx is not installed in this image; importing this module raises an
actionable error at task construction (structural tests cover the gate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _require_mjx():
    try:
        from mujoco import mjx  # noqa: F401

        return mjx
    except ImportError as e:  # pragma: no cover - mjx absent in CI image
        raise NotImplementedError(
            "the 'mjx:*' device tasks require mujoco-mjx (pip package "
            "'mujoco-mjx'), which is not installed on this host; use "
            "env.backend=batched_mujoco for host-side batched MuJoCo, or a "
            "pure-JAX device task (pendulum/linear)"
        ) from e


def _hopper_terminated(qpos, qvel):
    z, ang = qpos[1], qpos[2]
    sv = jnp.concatenate([qpos[2:], qvel])
    healthy = (
        jnp.all(jnp.abs(sv) < 100.0)
        & (z > 0.7)
        & (ang > -0.2)
        & (ang < 0.2)
    )
    return ~healthy


def _walker2d_terminated(qpos, qvel):
    z, ang = qpos[1], qpos[2]
    return ~((z > 0.8) & (z < 2.0) & (ang > -1.0) & (ang < 1.0))


def _never_terminated(qpos, qvel):
    return jnp.asarray(False)


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


class MJXLocomotionTask:
    """DeviceTask over `mjx.step`. phys state = mjx.Data (a pytree)."""

    def __init__(
        self,
        env_name: str,
        normalization_path: str,
        **kwargs,
    ):
        mjx = _require_mjx()
        import mujoco

        from dppo_tpu.envs.batched_mujoco import _gym_xml

        base = env_name.split("-")[0].lower()
        if base not in _TASKS:
            raise ValueError(
                f"mjx backend supports {sorted(_TASKS)}, got {env_name!r}"
            )
        self.task = _TASKS[base]
        self._mj_model = mujoco.MjModel.from_xml_path(
            _gym_xml(self.task["xml"])
        )
        self.model = mjx.put_model(self._mj_model)
        self._mjx = mjx
        self.nq, self.nv = self._mj_model.nq, self._mj_model.nv
        self.frame_skip = self.task["frame_skip"]
        self.dt = self._mj_model.opt.timestep * self.frame_skip
        self.obs_dim = self.nq - 1 + self.nv
        self.action_dim = self._mj_model.nu
        self._init_qpos = jnp.asarray(self._mj_model.qpos0)
        self._init_qvel = jnp.zeros(self.nv)

        norm = np.load(normalization_path)
        self.obs_min = jnp.asarray(norm["obs_min"], jnp.float32)
        self.obs_max = jnp.asarray(norm["obs_max"], jnp.float32)
        self.action_min = jnp.asarray(norm["action_min"], jnp.float32)
        self.action_max = jnp.asarray(norm["action_max"], jnp.float32)

    def _obs(self, qpos, qvel):
        from dppo_tpu.envs.wrappers.mujoco_locomotion import normalize_obs

        if self.task["clip_qvel"] is not None:
            c = self.task["clip_qvel"]
            qvel = jnp.clip(qvel, -c, c)
        raw = jnp.concatenate([qpos[1:], qvel])
        return normalize_obs(raw, self.obs_min, self.obs_max).astype(
            jnp.float32
        )

    def reset(self, rng):
        noise = self.task["reset_noise"]
        kq, kv = jax.random.split(rng)
        qpos = self._init_qpos + jax.random.uniform(
            kq, (self.nq,), minval=-noise, maxval=noise
        )
        if self.task["reset_qvel"] == "uniform":
            qvel = self._init_qvel + jax.random.uniform(
                kv, (self.nv,), minval=-noise, maxval=noise
            )
        else:  # halfcheetah: init_qvel + noise * N(0,1)
            qvel = self._init_qvel + noise * jax.random.normal(kv, (self.nv,))
        data = self._mjx.make_data(self.model).replace(qpos=qpos, qvel=qvel)
        data = self._mjx.forward(self.model, data)
        return data, self._obs(data.qpos, data.qvel)

    def step(self, data, action, rng):
        from dppo_tpu.envs.wrappers.mujoco_locomotion import (
            unnormalize_action,
        )

        del rng
        raw = unnormalize_action(action, self.action_min, self.action_max)
        x_before = data.qpos[0]
        data = data.replace(ctrl=raw)

        def sim(d, _):
            return self._mjx.step(self.model, d), None

        data, _ = jax.lax.scan(sim, data, None, length=self.frame_skip)
        x_vel = (data.qpos[0] - x_before) / self.dt
        # gymnasium ctrl cost uses the unclamped action (hopper_v4.py:96-98)
        reward = (
            self.task["healthy_reward"]
            + self.task["forward_w"] * x_vel
            - self.task["ctrl_cost"] * jnp.sum(raw**2)
        )
        terminated = self.task["terminated"](data.qpos, data.qvel)
        return (
            data,
            self._obs(data.qpos, data.qvel),
            reward.astype(jnp.float32),
            terminated,
        )
