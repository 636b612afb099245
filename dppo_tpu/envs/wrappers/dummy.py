"""Fast fake task environment for tests and benches.

The analog of the reference's `dummy_env_fn` test double
(`env/gym_utils/__init__.py:179-221`), promoted to a steppable env: linear
dynamics with a state-dependent optimal action, dense reward, optional
early termination. Deterministic under seeding, needs no simulator.
"""

from __future__ import annotations

import numpy as np


class DummyLowdimWrapper:
    def __init__(
        self,
        env=None,  # factory parity — no underlying sim
        obs_dim: int = 11,
        action_dim: int = 3,
        horizon: int = 1000,
        terminate_prob: float = 0.0,
        **kwargs,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.horizon = horizon
        self.terminate_prob = terminate_prob
        self._rng = np.random.default_rng(0)
        rng = np.random.default_rng(12345)  # fixed task structure
        self.W = rng.standard_normal((obs_dim, action_dim)).astype(
            np.float32
        ) / np.sqrt(obs_dim)
        self.A = (
            np.eye(obs_dim, dtype=np.float32) * 0.9
            + 0.05 * rng.standard_normal((obs_dim, obs_dim)).astype(np.float32)
        )
        self.Ba = rng.standard_normal((action_dim, obs_dim)).astype(np.float32)
        self.state = np.zeros(obs_dim, dtype=np.float32)
        self.action_space = _BoxLike((action_dim,))

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)

    def reset(self, seed=None, options=None):
        if seed is not None:
            self.seed(seed)
        self.state = self._rng.standard_normal(self.obs_dim).astype(np.float32)
        self.t = 0
        return {"state": self.state.copy()}

    def step(self, action):
        action = np.asarray(action, dtype=np.float32)
        target = np.tanh(self.state @ self.W)
        reward = float(np.exp(-np.sum((action - target) ** 2)))
        self.state = np.tanh(
            self.state @ self.A + action @ self.Ba
            + 0.01 * self._rng.standard_normal(self.obs_dim).astype(np.float32)
        )
        self.t += 1
        terminated = bool(self._rng.random() < self.terminate_prob)
        return {"state": self.state.copy()}, reward, terminated, False, {}

    def render(self, **kwargs):
        return None

    def close(self):
        pass


class _BoxLike:
    def __init__(self, shape):
        self.shape = shape
        self.dtype = np.float32

    def sample(self):
        return np.zeros(self.shape, dtype=np.float32)


class DummyImgWrapper(DummyLowdimWrapper):
    """Dummy env with pixel observations: renders state into a small image."""

    def __init__(self, env=None, obs_dim=5, action_dim=2, img_h=32, img_w=32,
                 **kwargs):
        super().__init__(env, obs_dim=obs_dim, action_dim=action_dim, **kwargs)
        self.img_h = img_h
        self.img_w = img_w

    def _render_obs(self, obs):
        # deterministic "image" of the state: outer-product pattern in [0,255]
        s = obs["state"]
        v = np.tanh(s @ self.W)  # (action_dim,)
        row = np.linspace(-1, 1, self.img_w, dtype=np.float32)
        img = np.outer(np.linspace(-1, 1, self.img_h), row)[None] * v[0]
        img = np.repeat(img, 3, axis=0)
        img = ((img + 1) * 127.5).astype(np.float32)
        return {"state": obs["state"], "rgb": img}

    def reset(self, seed=None, options=None):
        return self._render_obs(super().reset(seed=seed, options=options))

    def step(self, action):
        obs, r, term, trunc, info = super().step(action)
        return self._render_obs(obs), r, term, trunc, info
