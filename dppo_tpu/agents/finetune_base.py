"""Fine-tuning agent bases.

Parity targets: `agent/finetune/train_agent.py:19` (TrainAgent — venv build,
per-env seeding, model build, rollout/iteration params, `{itr, model}`
checkpoints, env reset helpers) and `agent/finetune/train_ppo_agent.py:16`
(TrainPPOAgent — separate AdamW + cosine-warmup-restart schedules for
actor_ft and critic, GAE λ, target-KL, update epochs, entropy/vf coefs,
running reward scaler, BC-loss knobs).

The optimizers are optax chains whose learning rate is injected per
*iteration* (the reference steps its schedulers once per iteration, not per
gradient step) inside the jitted update program.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.base import BaseAgent, MetricsLogger
from dppo_tpu.config import instantiate
from dppo_tpu.envs import make_async
from dppo_tpu.utils.ckpt import load_checkpoint, save_checkpoint
from dppo_tpu.utils.reward_scaling import init_reward_scaler
from dppo_tpu.utils.scheduler import cosine_warmup_restarts

log = logging.getLogger(__name__)


def make_optimizer(lr_placeholder: float, weight_decay: float, max_grad_norm=None):
    """AdamW with injected learning rate; optional global-norm clipping."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_placeholder, weight_decay=weight_decay
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def set_lr(opt_state, lr):
    """Return opt_state with every injected learning rate replaced (jit-safe).

    Walks arbitrarily nested optimizer states (chains, MultiSteps wrappers)
    looking for InjectHyperparamsState-like nodes."""

    def walk(state):
        if hasattr(state, "hyperparams") and "learning_rate" in getattr(
            state, "hyperparams", {}
        ):
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr)
            state = state._replace(hyperparams=hp)
        if hasattr(state, "_fields"):  # NamedTuple: recurse into fields
            return state._replace(
                **{
                    f: walk(getattr(state, f))
                    for f in state._fields
                    if isinstance(getattr(state, f), tuple)
                }
            )
        if isinstance(state, tuple):
            return tuple(walk(s) for s in state)
        return state

    return walk(opt_state)


class TrainAgent(BaseAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.device = cfg.get("device")  # parity; ignored (jax default device)
        self.env_name = cfg.env.name
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
        self.reset_at_iteration = bool(cfg.env.get("reset_at_iteration", True))
        self.save_full_observations = bool(
            cfg.env.get("save_full_observations", False)
        )
        self.furniture_sparse_reward = bool(
            (cfg.env.get("specific") or {}).get("sparse_reward", False)
        )
        self.batch_size = int(cfg.train.batch_size)
        self.model = instantiate(cfg.model)
        self.itr = 0
        self.n_train_itr = int(cfg.train.n_train_itr)
        self.val_freq = int(cfg.train.val_freq)
        self.force_train = bool(cfg.train.get("force_train", False))
        self.n_steps = int(cfg.train.n_steps)
        self.best_reward_threshold_for_success = float(
            cfg.env.get("best_reward_threshold_for_success", 1.0)
        )
        self.max_grad_norm = cfg.train.get("max_grad_norm")
        self.render_dir = os.path.join(self.logdir, "render")
        os.makedirs(self.render_dir, exist_ok=True)
        self.result_path = os.path.join(self.logdir, "result.pkl")
        self.save_trajs = bool(cfg.train.get("save_trajs", False))
        self.log_freq = int(cfg.train.get("log_freq", 1))
        self.save_model_freq = int(cfg.train.save_model_freq)
        render_cfg = cfg.train.get("render") or {}
        self.render_freq = int(render_cfg.get("freq", 1))
        self.n_render = int(render_cfg.get("num", 0))
        self.render_video = bool(cfg.env.get("save_video", False))
        self.traj_plotter = (
            instantiate(cfg.train.plotter) if "plotter" in cfg.train else None
        )
        self.logger = MetricsLogger(cfg, self.result_path)

    # ---- checkpoints: {itr, model} (parity train_agent.py:125-145) ----
    def save_model(self, params: Any):
        path = os.path.join(self.checkpoint_dir, f"state_{self.itr}.pkl")
        save_checkpoint(path, {"itr": self.itr, "model": params})
        log.info("Saved model to %s", path)

    def load(self, itr: int):
        path = os.path.join(self.checkpoint_dir, f"state_{itr}.pkl")
        data = load_checkpoint(path)
        self.itr = data["itr"]
        return jax.tree_util.tree_map(jnp.asarray, data["model"])

    # ---- env helpers (parity train_agent.py:147-171) ----
    def reset_env_all(self, verbose: bool = False, options_venv=None, **kwargs):
        if options_venv is None:
            options_venv = [dict(kwargs) for _ in range(self.n_envs)]
        obs_venv = self.venv.reset_arg(options_list=options_venv)
        if isinstance(obs_venv, list):
            obs_venv = {
                k: np.stack([o[k] for o in obs_venv]) for k in obs_venv[0]
            }
        if verbose:
            for i in range(self.n_envs):
                log.info("<-- Reset env %d with options %s", i, options_venv[i])
        return obs_venv

    def reset_env(self, env_ind: int, verbose: bool = False):
        obs = self.venv.reset_one_arg(env_ind=env_ind, options={})
        if verbose:
            log.info("<-- Reset env %d", env_ind)
        return obs


    # ------------------------------------------------------------------
    def _episode_stats(self, firsts_trajs, reward_trajs):
        """Episode accounting (parity: train_ppo_diffusion_agent.py:153-193)."""
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
            episode_reward = np.array(
                [np.sum(r) for r in reward_trajs_split]
            )
            if self.furniture_sparse_reward:
                episode_best_reward = episode_reward
            else:
                episode_best_reward = np.array(
                    [np.max(r) / self.act_steps for r in reward_trajs_split]
                )
            return {
                "num_episode_finished": len(reward_trajs_split),
                "avg_episode_reward": float(np.mean(episode_reward)),
                "avg_best_reward": float(np.mean(episode_best_reward)),
                "success_rate": float(
                    np.mean(
                        episode_best_reward
                        >= self.best_reward_threshold_for_success
                    )
                ),
            }
        log.info("[WARNING] No episode completed within the iteration!")
        return {
            "num_episode_finished": 0,
            "avg_episode_reward": 0.0,
            "avg_best_reward": 0.0,
            "success_rate": 0.0,
        }

    def _log_iteration(self, eval_mode, stats, diag, cnt_train_step, timer):
        record = {"itr": self.itr, "step": cnt_train_step}
        if self.itr % self.log_freq == 0:
            t = timer()
            record["time"] = t
            if eval_mode:
                log.info(
                    "eval: success rate %.4f | avg episode reward %.4f | avg best reward %.4f",
                    stats["success_rate"],
                    stats["avg_episode_reward"],
                    stats["avg_best_reward"],
                )
                self.logger.log(
                    {
                        "success rate - eval": stats["success_rate"],
                        "avg episode reward - eval": stats["avg_episode_reward"],
                        "avg best reward - eval": stats["avg_best_reward"],
                        "num episode - eval": stats["num_episode_finished"],
                    },
                    step=self.itr,
                    commit=False,
                )
                record["eval_success_rate"] = stats["success_rate"]
                record["eval_episode_reward"] = stats["avg_episode_reward"]
                record["eval_best_reward"] = stats["avg_best_reward"]
            else:
                diag_str = " | ".join(
                    f"{k} {v:8.4f}"
                    for k, v in diag.items()
                    if isinstance(v, float)
                )
                log.info(
                    "%d: step %8d | reward %8.4f | %s | t %8.2f",
                    self.itr,
                    cnt_train_step,
                    stats["avg_episode_reward"],
                    diag_str,
                    t,
                )
                self.logger.log(
                    {
                        "total env step": cnt_train_step,
                        "avg episode reward - train": stats["avg_episode_reward"],
                        "num episode - train": stats["num_episode_finished"],
                        **diag,
                    },
                    step=self.itr,
                    commit=True,
                )
                record["train_episode_reward"] = stats["avg_episode_reward"]
        self.logger.append_result(record)



class TrainPPOAgent(TrainAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gamma = float(cfg.train.gamma)
        self.n_critic_warmup_itr = int(cfg.train.n_critic_warmup_itr)
        self.gae_lambda = float(cfg.train.get("gae_lambda", 0.95))
        self.target_kl = cfg.train.get("target_kl")
        self.update_epochs = int(cfg.train.update_epochs)
        self.ent_coef = float(cfg.train.get("ent_coef", 0))
        self.vf_coef = float(cfg.train.get("vf_coef", 0))
        self.reward_scale_running = bool(cfg.train.reward_scale_running)
        self.reward_scaler_state = init_reward_scaler(self.n_envs)
        self.reward_scale_const = float(cfg.train.get("reward_scale_const", 1))
        self.use_bc_loss = bool(cfg.train.get("use_bc_loss", False))
        self.bc_loss_coeff = float(cfg.train.get("bc_loss_coeff", 0))
        # logprob recompute is a full-batch on-device op here; knob kept for
        # config parity (reference chunks to avoid GPU OOM, :22-25)
        self.logprob_batch_size = int(cfg.train.get("logprob_batch_size", 10000))

        a = cfg.train.actor_lr_scheduler
        self.actor_lr = cosine_warmup_restarts(
            float(cfg.train.actor_lr),
            float(a.min_lr),
            int(a.first_cycle_steps),
            int(a.warmup_steps),
        )
        c = cfg.train.critic_lr_scheduler
        self.critic_lr = cosine_warmup_restarts(
            float(cfg.train.critic_lr),
            float(c.min_lr),
            int(c.first_cycle_steps),
            int(c.warmup_steps),
        )
        self.actor_optimizer = make_optimizer(
            float(cfg.train.actor_lr),
            float(cfg.train.actor_weight_decay),
            self.max_grad_norm,
        )
        self.critic_optimizer = make_optimizer(
            float(cfg.train.critic_lr), float(cfg.train.critic_weight_decay)
        )
