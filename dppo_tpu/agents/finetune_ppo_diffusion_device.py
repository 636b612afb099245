"""DPPO fine-tuning with a TPU-resident env: the fully fused iteration.

No reference counterpart — the closest is the GPU-batched IsaacGym loop
(`agent/finetune/train_ppo_diffusion_agent.py` driving
`FurnitureRLSimEnvMultiStepWrapper`), which still crosses host↔device every
macro-step. Here the env IS a JAX program (`envs/device/`), so one training
iteration — the n_steps rollout (K-step denoising scan + batched env chunk
step per macro-step) AND the full PPO update — compiles into a SINGLE XLA
program: zero host↔device crossings inside an iteration, one dispatch per
iteration. The loop itself lives in `agents/device_fused.DeviceFusedMixin`
(shared with the Gaussian-family fused agent); this class contributes the
DPPO specifics: the chain-returning sampler and the ft-window promote that
re-bakes the chain shape into the jitted programs.

Requires `env.backend=device` (a DeviceVectorEnv); everything else (model,
update math, logging, checkpoints, promote annealing) is inherited from
TrainPPODiffusionAgent. Episode accounting runs host-side on the small
(S, E) reward/firsts arrays fetched once per iteration.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent
from dppo_tpu.agents.finetune_ppo_diffusion_img import (
    TrainPPOImgDiffusionAgent,
)

log = logging.getLogger(__name__)


class TrainPPODiffusionDeviceAgent(DeviceFusedMixin, TrainPPODiffusionAgent):
    def __init__(self, cfg):
        # validate the env config up front (before the base class builds the
        # model and loads the pretrained checkpoint)
        self._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()

    def _device_sample(self, params, obs, rng, train):
        samples = self.model.sample(
            params,
            obs,
            rng,
            deterministic=not train,
            return_chain=True,
        )
        return samples.trajectories, samples.chains

    def _maybe_promote(self):
        promote = self.model.step()
        if promote:
            p = self.update_state.params
            self.update_state = self.update_state._replace(
                params=p._replace(
                    actor=jax.tree_util.tree_map(jnp.copy, p.actor_ft)
                )
            )
            self.K_ft = self.model.ft_denoising_steps
            self._build_sampler()
            self._build_device_programs()

    def _save_device_checkpoint(self):
        self.save_model(self.update_state.params)
        self.save_full_state()


class TrainPPOImgDiffusionDeviceAgent(
    TrainPPODiffusionDeviceAgent, TrainPPOImgDiffusionAgent
):
    """Pixel DPPO, fully TPU-resident.

    The reference's img agent (`train_ppo_diffusion_img_agent.py:36,357`)
    requires a host simulator rendering frames across the host↔device
    boundary every macro-step; here the env renders ON the chip
    (`PendulumPixelsTask.split_obs` — pure-jnp rasterization from the
    latent state history), so the whole iteration — n_steps of (render →
    ViT + VisionDiffusionMLP denoising scan → env chunk-step) plus the
    complete PPO update with buffer-level RandomShiftsAug, chunked
    value/old-logprob recompute, and optax.MultiSteps gradient
    accumulation — compiles into ONE XLA program. The vision machinery
    (augment, grad-accum optimizer rebuild, shape_meta obs dims) is
    inherited unchanged from the host img agent; the fused loop from
    DeviceFusedMixin, whose `_device_obs` hook surfaces the rendered
    {"rgb", "state"} dict."""


class TrainPPOVisDiffusionDeviceAgent(
    TrainPPOImgDiffusionDeviceAgent
):
    """Fork-parity visual-key generalization on the fused device path."""

    def __init__(self, cfg):
        self.visual_key = cfg.train.get("vis_key", "rgb")
        super().__init__(cfg)
