"""Action-chunk execution wrapper.

Capability parity with `env/gym_utils/wrapper/multi_step.py` (MultiStep:82):
executes `n_action_steps` inner sim steps per `step()` call, aggregates
reward (sum by default), maintains an observation deque stacked into a
`n_obs_steps` history with edge padding, separates terminated/truncated
(honoring an episode-step budget), optionally resets in-wrapper on done with
the pre-reset observation stashed in `info["final_obs"]` for truncation
bootstrapping, and can pass the full per-substep observation sequence via
`info["full_obs"]`.

Works over any task wrapper exposing the 5-tuple step API
(obs_dict, reward, terminated, truncated, info) and reset(seed, options).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np


def stack_last_n_obs(all_obs, n_steps: int) -> np.ndarray:
    all_obs = list(all_obs)
    result = np.zeros((n_steps,) + all_obs[-1].shape, dtype=all_obs[-1].dtype)
    start = -min(n_steps, len(all_obs))
    result[start:] = np.array(all_obs[start:])
    if n_steps > len(all_obs):
        result[:start] = result[start]
    return result


class MultiStep:
    def __init__(
        self,
        env,
        n_obs_steps: int = 1,
        n_action_steps: int = 1,
        max_episode_steps: Optional[int] = None,
        reward_agg_method: str = "sum",
        prev_action: bool = True,
        reset_within_step: bool = False,
        pass_full_observations: bool = False,
        verbose: bool = False,
        **kwargs,
    ):
        self.env = env
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.max_episode_steps = max_episode_steps
        self.reward_agg_method = reward_agg_method
        self.reset_within_step = reset_within_step
        self.pass_full_observations = pass_full_observations
        self.verbose = verbose
        self.cnt = 0
        self.obs: deque = deque(maxlen=max(n_obs_steps + 1, n_action_steps))

    # proxy attributes (spaces, seed, render, close) to the task wrapper
    def __getattr__(self, name):
        return getattr(self.env, name)

    def seed(self, seed=None):
        return self.env.seed(seed)

    def reset(self, seed=None, options=None):
        obs = self.env.reset(seed=seed, options=options or {})
        self.obs = deque([obs], maxlen=max(self.n_obs_steps + 1, self.n_action_steps))
        self.cnt = 0
        return self._get_obs(self.n_obs_steps)

    def step(self, action: np.ndarray):
        """action: (n_action_steps, Da) — executes up to n_action_steps substeps."""
        if action.ndim == 1:
            action = action[None]
        terminated = False
        truncated = False
        rewards = []
        info = {}
        act_step = 0
        for act_step, act in enumerate(action):
            if terminated or truncated:
                break
            self.cnt += 1
            obs, reward, term, trunc, info = self.env.step(act)
            self.obs.append(obs)
            rewards.append(reward)
            terminated = terminated or bool(term)
            if (
                not terminated
                and self.max_episode_steps is not None
                and self.cnt >= self.max_episode_steps
            ):
                truncated = True
            truncated = truncated or bool(trunc)

        observation = self._get_obs(self.n_obs_steps)
        agg = {"sum": np.sum, "max": np.max, "min": np.min, "mean": np.mean}[
            self.reward_agg_method
        ]
        reward = float(agg(rewards)) if rewards else 0.0
        if self.pass_full_observations:
            info["full_obs"] = self._get_obs(act_step + 1)

        if self.reset_within_step and (terminated or truncated):
            if truncated:
                info["final_obs"] = observation
            observation = self.reset()
            if self.verbose:
                print("Reset env within wrapper.")
        return observation, reward, terminated, truncated, info

    def _get_obs(self, n_steps: int = 1):
        assert len(self.obs) > 0
        sample = self.obs[-1]
        if isinstance(sample, dict):
            return {
                key: stack_last_n_obs([o[key] for o in self.obs], n_steps)
                for key in sample
            }
        return stack_last_n_obs(self.obs, n_steps)

    def render(self, **kwargs):
        return self.env.render(**kwargs)

    def close(self):
        return self.env.close()
