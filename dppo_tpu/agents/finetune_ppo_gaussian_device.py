"""Gaussian/GMM PPO fine-tuning with a TPU-resident env (fused iteration).

No reference counterpart (the reference's Gaussian PPO loop,
`agent/finetune/train_ppo_gaussian_agent.py`, always drives host simulator
processes). With `env.backend=device` the env is a JAX program, so the whole
training iteration — n_steps rollout (one policy query + batched env chunk
step per macro-step) plus the complete PPO update — is ONE XLA dispatch.
The loop lives in `agents/device_fused.DeviceFusedMixin` (shared with the
DPPO fused agent); the per-step record stored for the update is the sampled
action chunk itself (host-loop parity: `samples_trajs`).

Serves GMM policies too — `TrainPPOGaussianAgent` already handles both
(the model interface is identical).
"""

from __future__ import annotations

import logging

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_ppo_exact_diffusion import (
    TrainPPOExactDiffusionAgent,
)
from dppo_tpu.agents.finetune_ppo_gaussian import TrainPPOGaussianAgent

log = logging.getLogger(__name__)


class TrainPPOGaussianDeviceAgent(DeviceFusedMixin, TrainPPOGaussianAgent):
    def __init__(self, cfg):
        self._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()

    def _device_sample(self, params, obs, rng, train):
        actions = self.model.sample(
            params, obs, rng, deterministic=not train
        )
        return actions, actions


class TrainPPOExactDiffusionDeviceAgent(DeviceFusedMixin, TrainPPOExactDiffusionAgent):
    """Exact-likelihood DPPO on a device env: same fused iteration as the
    Gaussian path (the PPO update batches over (step x env) only; old/new
    log-probs are the ODE likelihoods of the final action), with the
    diffusion sampler supplying actions."""

    def __init__(self, cfg):
        self._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()

    def _device_sample(self, params, obs, rng, train):
        actions = self.model.sample(
            params, obs, rng, deterministic=not train, return_chain=False
        ).trajectories
        return actions, actions
