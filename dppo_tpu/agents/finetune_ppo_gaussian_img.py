"""Pixel / visual-keyed Gaussian PPO fine-tuning.

Parity targets: `agent/finetune/train_ppo_gaussian_img_agent.py` (438 LoC)
and the fork's `train_ppo_gaussian_vis_agent.py` (441 LoC): the Gaussian PPO
loop with shape_meta obs dicts, rollout-buffer-level random-shift
augmentation, and gradient accumulation via `optax.MultiSteps`.
"""

from __future__ import annotations

import logging

import jax
import optax

from dppo_tpu.agents.finetune_ppo_diffusion import UpdateState
from dppo_tpu.agents.finetune_ppo_gaussian import TrainPPOGaussianAgent
from dppo_tpu.nets.modules import random_shift_aug

log = logging.getLogger(__name__)


class TrainPPOImgGaussianAgent(TrainPPOGaussianAgent):
    visual_key = "rgb"

    def __init__(self, cfg):
        self.augment = bool(cfg.train.get("augment", False))
        self.grad_accumulate = int(cfg.train.get("grad_accumulate", 1))
        self._shape_meta = cfg.shape_meta
        super().__init__(cfg)
        if self.grad_accumulate > 1:
            self.actor_optimizer = optax.MultiSteps(
                self.actor_optimizer, every_k_schedule=self.grad_accumulate
            )
            self.critic_optimizer = optax.MultiSteps(
                self.critic_optimizer, every_k_schedule=self.grad_accumulate
            )
            params = self.update_state.params
            self.update_state = UpdateState(
                params=params,
                actor_opt=self.actor_optimizer.init(params.actor_ft),
                critic_opt=self.critic_optimizer.init(params.critic),
                eta_opt=None,
                reward_scaler=self.update_state.reward_scaler,
            )
            self._jit_update = jax.jit(self._update)

    def _build_obs_dims(self):
        return {
            k: (self.n_cond_step,) + tuple(self._shape_meta.obs[k]["shape"])
            for k in self._shape_meta.obs
        }

    def _augment_obs(self, obs_trajs: dict, rng) -> dict:
        if not self.augment or self.visual_key != "rgb":
            return obs_trajs
        rgb = obs_trajs["rgb"]
        S, E, To, C, H, W = rgb.shape
        flat = random_shift_aug(rng, rgb.reshape(S * E * To, C, H, W))
        return {**obs_trajs, "rgb": flat.reshape(S, E, To, C, H, W)}


class TrainPPOVisGaussianAgent(TrainPPOImgGaussianAgent):
    """Fork-added generalization to any visual key (rgb or point)."""

    def __init__(self, cfg):
        self.visual_key = cfg.train.get("vis_key", "rgb")
        super().__init__(cfg)
