"""Pixel / visual-keyed DPPO fine-tuning.

Parity targets: `agent/finetune/train_ppo_diffusion_img_agent.py:20`
(TrainPPOImgDiffusionAgent — obs dict per shape_meta, rollout-buffer-level
RandomShiftsAug applied once per update (:180-190), critic evaluated without
augmentation, gradient accumulation (:36, :357)) and the fork's
`train_ppo_diffusion_vis_agent.py` (TrainPPOVisDiffusionAgent — generalizes
the visual key to "rgb" or "point" via cfg.train.vis_key).

Gradient accumulation maps onto `optax.MultiSteps` so the fused update
program is unchanged — updates materialize every `grad_accumulate`
minibatches, exactly the reference cadence.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import optax

from dppo_tpu.agents.finetune_base import make_optimizer
from dppo_tpu.agents.finetune_ppo_diffusion import (
    TrainPPODiffusionAgent,
    UpdateState,
)
from dppo_tpu.nets.modules import random_shift_aug

log = logging.getLogger(__name__)


class TrainPPOImgDiffusionAgent(TrainPPODiffusionAgent):
    visual_key = "rgb"

    def __init__(self, cfg):
        self.augment = bool(cfg.train.get("augment", False))
        self.grad_accumulate = int(cfg.train.get("grad_accumulate", 1))
        self._shape_meta = cfg.shape_meta
        super().__init__(cfg)
        if self.grad_accumulate > 1:
            # rebuild optimizers with accumulation; re-init their states
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
                eta_opt=self.update_state.eta_opt,
                reward_scaler=self.update_state.reward_scaler,
            )
            self._jit_update = jax.jit(self._update)

    def _build_obs_dims(self):
        # buffers carry an obs-history axis ahead of each modality's shape
        return {
            k: (self.n_cond_step,) + tuple(self._shape_meta.obs[k]["shape"])
            for k in self._shape_meta.obs
        }

    def _augment_obs(self, obs_trajs: dict, rng) -> dict:
        if not self.augment or self.visual_key != "rgb":
            return obs_trajs
        rgb = obs_trajs["rgb"]  # (S, E, To, C, H, W)
        S, E, To, C, H, W = rgb.shape
        flat = rgb.reshape(S * E * To, C, H, W)
        flat = random_shift_aug(rng, flat)
        return {**obs_trajs, "rgb": flat.reshape(S, E, To, C, H, W)}


class TrainPPOVisDiffusionAgent(TrainPPOImgDiffusionAgent):
    """Fork-added generalization to any visual key (rgb or point)."""

    def __init__(self, cfg):
        self.visual_key = cfg.train.get("vis_key", "rgb")
        super().__init__(cfg)
