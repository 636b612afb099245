"""Deterministic linear-dynamics device task.

The on-device analog of the dummy test env
(`envs/wrappers/dummy.py`, itself the promotion of the reference's
`dummy_env_fn` test double, `env/gym_utils/__init__.py:179-221`):
tanh-linear dynamics with a state-dependent optimal action and a dense
exp(-error²) reward. Unlike the host dummy it is fully deterministic
(optional norm-threshold termination instead of random termination and a
fixed-point reset mode), which makes it the golden-test vehicle for proving
the DevicePool's MultiStep semantics against the host `MultiStep` wrapper
bit for bit — see `tests/test_device_env.py`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class LinearTask:
    def __init__(
        self,
        obs_dim: int = 11,
        action_dim: int = 3,
        terminate_norm: Optional[float] = None,
        reset_mode: str = "normal",  # "normal" | "fixed"
        seed: int = 12345,  # task-structure seed (matches the host dummy)
        **kwargs,
    ):
        self.obs_dim = int(obs_dim)
        self.action_dim = int(action_dim)
        self.terminate_norm = terminate_norm
        self.reset_mode = reset_mode
        rng = np.random.default_rng(seed)
        self.W = jnp.asarray(
            rng.standard_normal((obs_dim, action_dim)), jnp.float32
        ) / np.sqrt(obs_dim)
        self.A = jnp.asarray(
            np.eye(obs_dim) * 0.9
            + 0.05 * rng.standard_normal((obs_dim, obs_dim)),
            jnp.float32,
        )
        self.Ba = jnp.asarray(
            rng.standard_normal((action_dim, obs_dim)), jnp.float32
        )
        self.x0 = jnp.asarray(
            0.5 * rng.standard_normal(obs_dim), jnp.float32
        )

    def reset(self, rng):
        if self.reset_mode == "fixed":
            state = self.x0
        else:
            state = jax.random.normal(rng, (self.obs_dim,), jnp.float32)
        return state, state

    def step(self, state, action, rng):
        del rng
        action = action.astype(jnp.float32)
        target = jnp.tanh(state @ self.W)
        reward = jnp.exp(-jnp.sum((action - target) ** 2))
        new_state = jnp.tanh(state @ self.A + action @ self.Ba)
        if self.terminate_norm is not None:
            terminated = (
                jnp.max(jnp.abs(new_state)) > self.terminate_norm
            )
        else:
            terminated = jnp.asarray(False)
        return new_state, new_state, reward.astype(jnp.float32), terminated
