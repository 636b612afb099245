"""Eval agent base + concrete evaluators.

Parity: `agent/eval/eval_agent.py:17` (EvalAgent — same env construction as
TrainAgent, deterministic rollouts only, `result.npz` output) and the four
concrete evaluators (`eval_diffusion_agent.py:21`, `eval_gaussian_agent.py`,
`eval_{diffusion,gaussian}_img_agent.py`).
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.base import BaseAgent
from dppo_tpu.config import instantiate
from dppo_tpu.envs import make_async
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class EvalAgent(BaseAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        env_type = cfg.env.get("env_type")
        self.venv = make_async(
            cfg.env.name,
            env_type=env_type,
            num_envs=int(cfg.env.n_envs),
            asynchronous=bool(cfg.env.get("asynchronous", True)),
            max_episode_steps=cfg.env.max_episode_steps,
            wrappers=cfg.env.get("wrappers"),
            robomimic_env_cfg_path=cfg.get("robomimic_env_cfg_path"),
            shape_meta=cfg.get("shape_meta"),
            use_image_obs=bool(cfg.env.get("use_image_obs", False)),
            render_offscreen=bool(cfg.env.get("save_video", False)),
            obs_dim=int(cfg.obs_dim),
            action_dim=int(cfg.action_dim),
            n_workers=cfg.env.get("n_workers"),
            use_shm=bool(cfg.env.get("use_shm", False)),
            backend=cfg.env.get("backend", "process"),
            device_task=cfg.env.get("device_task"),
            device_task_kwargs=cfg.env.get("device_task_kwargs"),
            fake_sim=bool(cfg.env.get("fake_sim", False)),
            record_states=bool(cfg.env.get("record_states", False)),
            **(cfg.env.get("specific") or {}),
        )
        if env_type != "furniture":
            self.venv.seed([self.seed + i for i in range(int(cfg.env.n_envs))])
        self.n_envs = int(cfg.env.n_envs)
        self.n_cond_step = int(cfg.cond_steps)
        self.obs_dim = int(cfg.obs_dim)
        self.action_dim = int(cfg.action_dim)
        self.act_steps = int(cfg.act_steps)
        self.horizon_steps = int(cfg.horizon_steps)
        self.max_episode_steps = int(cfg.env.max_episode_steps)
        self.save_full_observations = bool(
            cfg.env.get("save_full_observations", False)
        )
        self.furniture_sparse_reward = bool(
            (cfg.env.get("specific") or {}).get("sparse_reward", False)
        )
        self.model = instantiate(cfg.model)
        self.n_steps = int(cfg.n_steps)
        self.best_reward_threshold_for_success = float(
            cfg.env.get("best_reward_threshold_for_success", 1.0)
        )
        self.render_dir = os.path.join(self.logdir, "render")
        os.makedirs(self.render_dir, exist_ok=True)
        self.result_path = os.path.join(self.logdir, "result.npz")
        self.n_render = int(cfg.get("render_num", 0))
        self.render_video = bool(cfg.env.get("save_video", False))
        self.traj_plotter = (
            instantiate(cfg.plotter) if "plotter" in cfg else None
        )

    def reset_env_all(self, options_venv=None, **kwargs):
        if options_venv is None:
            options_venv = [dict(kwargs) for _ in range(self.n_envs)]
        obs_venv = self.venv.reset_arg(options_list=options_venv)
        if isinstance(obs_venv, list):
            obs_venv = {
                k: np.stack([o[k] for o in obs_venv]) for k in obs_venv[0]
            }
        return obs_venv

    # ---- shared eval rollout; subclasses provide _load_params/_act ----
    def _load_params(self):
        raise NotImplementedError

    def _act(self, params, cond, rng):
        raise NotImplementedError

    def run(self):
        timer = Timer()
        params = self._load_params()
        options_venv = [{} for _ in range(self.n_envs)]
        if self.render_video:
            for i in range(self.n_render):
                options_venv[i]["video_path"] = os.path.join(
                    self.render_dir, f"eval_trial-{i}.mp4"
                )
        firsts_trajs = np.zeros((self.n_steps + 1, self.n_envs))
        prev_obs_venv = self.reset_env_all(options_venv=options_venv)
        firsts_trajs[0] = 1
        reward_trajs = np.zeros((self.n_steps, self.n_envs))
        obs_full_trajs = None
        if self.save_full_observations:
            obs_full_trajs = np.empty((0, self.n_envs, self.obs_dim))
            obs_full_trajs = np.vstack(
                (obs_full_trajs, prev_obs_venv["state"][:, -1][None])
            )
        act_fn = jax.jit(self._act)
        for step in range(self.n_steps):
            # all observation modalities go into the condition (img eval
            # parity: eval_diffusion_img_agent feeds rgb alongside state)
            cond = {
                k: jnp.asarray(v, jnp.float32)
                for k, v in prev_obs_venv.items()
            }
            output_venv = np.asarray(act_fn(params, cond, self.next_rng()))
            action_venv = output_venv[:, : self.act_steps]
            obs_venv, reward_venv, terminated_venv, truncated_venv, info_venv = (
                self.venv.step(action_venv)
            )
            reward_trajs[step] = reward_venv
            firsts_trajs[step + 1] = terminated_venv | truncated_venv
            if self.save_full_observations:
                obs_full_venv = np.array(
                    [info["full_obs"]["state"] for info in info_venv]
                )
                obs_full_trajs = np.vstack(
                    (obs_full_trajs, obs_full_venv.transpose(1, 0, 2))
                )
            prev_obs_venv = obs_venv

        # episode accounting (parity: eval_diffusion_agent.py:82-121)
        episodes_start_end = []
        for env_ind in range(self.n_envs):
            env_steps = np.where(firsts_trajs[:, env_ind] == 1)[0]
            for i in range(len(env_steps) - 1):
                start, end = env_steps[i], env_steps[i + 1]
                if end - start > 1:
                    episodes_start_end.append((env_ind, start, end - 1))
        if episodes_start_end:
            reward_trajs_split = [
                reward_trajs[start : end + 1, env_ind]
                for env_ind, start, end in episodes_start_end
            ]
            num_episode_finished = len(reward_trajs_split)
            episode_reward = np.array([np.sum(r) for r in reward_trajs_split])
            if self.furniture_sparse_reward:
                episode_best_reward = episode_reward
            else:
                episode_best_reward = np.array(
                    [np.max(r) / self.act_steps for r in reward_trajs_split]
                )
            avg_episode_reward = float(np.mean(episode_reward))
            avg_best_reward = float(np.mean(episode_best_reward))
            success_rate = float(
                np.mean(
                    episode_best_reward >= self.best_reward_threshold_for_success
                )
            )
        else:
            num_episode_finished = 0
            avg_episode_reward = 0.0
            avg_best_reward = 0.0
            success_rate = 0.0
            log.info("[WARNING] No episode completed within the iteration!")

        if self.traj_plotter is not None:
            self.traj_plotter(
                obs_full_trajs=obs_full_trajs,
                n_render=self.n_render,
                max_episode_steps=self.max_episode_steps,
                render_dir=self.render_dir,
                itr=0,
            )
        elapsed = timer()
        log.info(
            "eval: num episode %4d | success rate %.4f | avg episode reward "
            "%.4f | avg best reward %.4f",
            num_episode_finished,
            success_rate,
            avg_episode_reward,
            avg_best_reward,
        )
        np.savez(
            self.result_path,
            num_episode=num_episode_finished,
            eval_success_rate=success_rate,
            eval_episode_reward=avg_episode_reward,
            eval_best_reward=avg_best_reward,
            time=elapsed,
        )
        return {
            "num_episode": num_episode_finished,
            "eval_success_rate": success_rate,
            "eval_episode_reward": avg_episode_reward,
            "eval_best_reward": avg_best_reward,
        }
