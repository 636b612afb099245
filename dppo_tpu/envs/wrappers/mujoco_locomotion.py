"""MuJoCo locomotion task wrapper over gymnasium.

Parity with `env/gym_utils/wrapper/mujoco_locomotion_lowdim.py:12`: dict
observations under "state", obs normalized to the demo statistics'
min/max→[-1,1] range, actions unnormalized from [-1,1], per-env numpy seeding.

Built on gymnasium (5-tuple step API) instead of gym 0.22; the underlying
env ids map d4rl-style names (`hopper-medium-v2`) onto gymnasium MuJoCo v4
tasks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

D4RL_TO_GYMNASIUM = {
    "hopper": "Hopper-v4",
    "walker2d": "Walker2d-v4",
    "halfcheetah": "HalfCheetah-v4",
    "ant": "Ant-v4",
    # classic-control task used by the TPU-resident env backend
    # (envs/device/pendulum.py); host-side gymnasium twin for demo
    # collection and parity tests
    "pendulum": "Pendulum-v1",
}


# d4rl's kitchen task sets (d4rl kitchen_envs.py: complete/partial both use
# the microwave-kettle-light-slider env; mixed uses bottom burner instead of
# the slide cabinet)
KITCHEN_TASKS = {
    "complete": ["microwave", "kettle", "light switch", "slide cabinet"],
    "partial": ["microwave", "kettle", "light switch", "slide cabinet"],
    "mixed": ["microwave", "kettle", "bottom burner", "light switch"],
}


def resolve_env_id(name: str) -> str:
    env_id, _ = resolve_env_spec(name)
    return env_id


def resolve_env_spec(name: str):
    """Map a d4rl-style env name to (gymnasium env id, make kwargs)."""
    base = name.split("-")[0].lower()
    if base in D4RL_TO_GYMNASIUM:
        return D4RL_TO_GYMNASIUM[base], {}
    if base == "kitchen":
        # d4rl kitchen-{complete,partial,mixed}-v0 -> gymnasium-robotics.
        # NOTE: the native observation is 59-dim (robot + object state);
        # d4rl's 60-dim (qp, obj_qp, goal) layout is a d4rl-ism that cannot
        # be reconstructed without d4rl itself — shipped kitchen configs use
        # obs_dim 59 accordingly.
        variant = name.split("-")[1].lower() if "-" in name else "complete"
        if variant not in KITCHEN_TASKS:
            raise ValueError(
                f"unknown kitchen variant {variant!r} in env name {name!r}; "
                f"expected one of {sorted(KITCHEN_TASKS)}"
            )
        import gymnasium
        import gymnasium_robotics

        gymnasium.register_envs(gymnasium_robotics)
        return "FrankaKitchen-v1", {"tasks_to_complete": KITCHEN_TASKS[variant]}
    return name, {}


def normalize_obs(obs, obs_min, obs_max):
    """obs min/max → [-1, 1] (shared with the batched backend)."""
    return 2 * ((obs - obs_min) / (obs_max - obs_min + 1e-6) - 0.5)


def unnormalize_action(action, action_min, action_max):
    """[-1, 1] → action min/max (shared with the batched backend)."""
    return ((action + 1) / 2.0) * (action_max - action_min) + action_min


class MujocoLocomotionLowdimWrapper:
    def __init__(self, env, normalization_path: str):
        self.env = env
        norm = np.load(normalization_path)
        self.obs_min = norm["obs_min"]
        self.obs_max = norm["obs_max"]
        self.action_min = norm["action_min"]
        self.action_max = norm["action_max"]
        self.action_space = env.action_space
        self.observation_space = None  # dict{"state"}; spaces built by pool

    def seed(self, seed: Optional[int] = None):
        self._seed = seed

    def normalize_obs(self, obs):
        return normalize_obs(obs, self.obs_min, self.obs_max)

    def unnormalize_action(self, action):
        return unnormalize_action(action, self.action_min, self.action_max)

    @staticmethod
    def _flatten_raw(raw_obs):
        """FrankaKitchen returns a goal-env dict; take the observation
        vector (d4rl kitchen exposes the same 59-dim state)."""
        if isinstance(raw_obs, dict):
            return np.asarray(raw_obs["observation"], dtype=np.float32)
        return raw_obs

    def reset(self, seed=None, options=None):
        options = options or {}
        seed = options.get("seed", seed if seed is not None else getattr(self, "_seed", None))
        self._seed = None if seed is None else seed + 1  # vary future resets
        raw_obs, _ = self.env.reset(seed=seed)
        raw_obs = self._flatten_raw(raw_obs)
        return {"state": self.normalize_obs(raw_obs).astype(np.float32)}

    def step(self, action):
        raw_action = self.unnormalize_action(action)
        raw_obs, reward, terminated, truncated, info = self.env.step(raw_action)
        raw_obs = self._flatten_raw(raw_obs)
        obs = {"state": self.normalize_obs(raw_obs).astype(np.float32)}
        # episode-length budgeting is owned by MultiStep (reference parity:
        # the inner TimeLimit is bypassed there); drop gymnasium's truncation
        return obs, float(reward), bool(terminated), False, info

    def render(self, **kwargs):
        return self.env.render()

    def close(self):
        self.env.close()
