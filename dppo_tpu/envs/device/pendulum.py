"""Pendulum-v1 as a device task: an exact JAX port of gymnasium's
`PendulumEnv` dynamics (gymnasium/envs/classic_control/pendulum.py), used to
exercise the fully-on-device rollout path with a real benchmark task.
Parity-tested step-for-step against the real env in
`tests/test_device_env.py`.

Task-wrapper semantics follow `wrapper/mujoco_locomotion_lowdim.py:12`
(our `envs/wrappers/mujoco_locomotion.py`): observations are min/max
normalized to [-1,1] against demo statistics, actions arrive in [-1,1] and
are unnormalized to the torque range. With `normalization_path=None` the
canonical space bounds (|cosθ|,|sinθ| ≤ 1, |θ̇| ≤ 8, |u| ≤ 2) are used.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.envs.wrappers.mujoco_locomotion import (
    normalize_obs,
    unnormalize_action,
)


class PendulumState(NamedTuple):
    th: jnp.ndarray  # () angle
    thdot: jnp.ndarray  # () angular velocity


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class PendulumTask:
    obs_dim = 3
    action_dim = 1

    def __init__(
        self,
        normalization_path: Optional[str] = None,
        g: float = 10.0,
        **kwargs,
    ):
        self.max_speed = 8.0
        self.max_torque = 2.0
        self.dt = 0.05
        self.g = float(g)
        self.m = 1.0
        self.l = 1.0
        if normalization_path is not None:
            norm = np.load(normalization_path)
            self.obs_min = jnp.asarray(norm["obs_min"], dtype=jnp.float32)
            self.obs_max = jnp.asarray(norm["obs_max"], dtype=jnp.float32)
            self.action_min = jnp.asarray(norm["action_min"], jnp.float32)
            self.action_max = jnp.asarray(norm["action_max"], jnp.float32)
        else:
            self.obs_min = jnp.asarray([-1.0, -1.0, -self.max_speed])
            self.obs_max = jnp.asarray([1.0, 1.0, self.max_speed])
            self.action_min = jnp.asarray([-self.max_torque])
            self.action_max = jnp.asarray([self.max_torque])

    def _obs(self, state: PendulumState) -> jnp.ndarray:
        raw = jnp.stack(
            [jnp.cos(state.th), jnp.sin(state.th), state.thdot]
        )
        return normalize_obs(raw, self.obs_min, self.obs_max).astype(
            jnp.float32
        )

    def reset(self, rng):
        # gymnasium reset: state ~ U(-[π, 1], [π, 1])
        high = jnp.asarray([jnp.pi, 1.0])
        s = jax.random.uniform(rng, (2,), minval=-high, maxval=high)
        state = PendulumState(th=s[0], thdot=s[1])
        return state, self._obs(state)

    def step(self, state: PendulumState, action, rng):
        del rng  # dynamics are deterministic
        u = unnormalize_action(action, self.action_min, self.action_max)[0]
        u = jnp.clip(u, -self.max_torque, self.max_torque)
        th, thdot = state.th, state.thdot
        costs = (
            angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * (u**2)
        )
        newthdot = thdot + (
            3 * self.g / (2 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        new_state = PendulumState(th=newth, thdot=newthdot)
        return (
            new_state,
            self._obs(new_state),
            (-costs).astype(jnp.float32),
            jnp.asarray(False),
        )
