"""D3IL state-observation task wrapper.

Parity with `env/gym_utils/wrapper/d3il_lowdim.py:14` (D3ilLowdimWrapper):
dict obs under "state", min/max→[-1,1] normalization, action
unnormalization, done always False. Requires the D3IL simulator package
(gated in the env factory).
"""

from __future__ import annotations

import numpy as np


class D3ilLowdimWrapper:
    def __init__(self, env, normalization_path: str, **kwargs):
        self.env = env
        norm = np.load(normalization_path)
        self.obs_min = norm["obs_min"]
        self.obs_max = norm["obs_max"]
        self.action_min = norm["action_min"]
        self.action_max = norm["action_max"]
        self.action_space = env.action_space

    def seed(self, seed=None):
        if seed is not None:
            np.random.seed(seed=seed)
        else:
            np.random.seed()

    def normalize_obs(self, obs):
        return 2 * ((obs - self.obs_min) / (self.obs_max - self.obs_min + 1e-6) - 0.5)

    def unnormalize_action(self, action):
        action = (action + 1) / 2
        return action * (self.action_max - self.action_min) + self.action_min

    def reset(self, seed=None, options=None):
        options = options or {}
        new_seed = options.get("seed", seed)
        if new_seed is not None:
            self.seed(seed=new_seed)
        obs = self.env.reset()
        return {"state": self.normalize_obs(obs).astype(np.float32)}

    def step(self, action):
        raw_action = self.unnormalize_action(action)
        obs, reward, done, info = self.env.step(raw_action)
        obs = self.normalize_obs(obs).astype(np.float32)
        return {"state": obs}, float(reward), False, False, info

    def render(self, **kwargs):
        return self.env.render()

    def close(self):
        if hasattr(self.env, "close"):
            self.env.close()
