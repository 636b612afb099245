"""Exact-likelihood DPPO fine-tuning.

Parity with `agent/finetune/train_ppo_exact_diffusion_agent.py` (405 LoC):
the DPPO loop where old/new log-probs are the *exact* ODE likelihoods of the
final sampled action (no per-denoising-step MDP), so the PPO update batches
over (step × env) only. Reuses the Gaussian PPO trainer skeleton with the
diffusion chain sampler plugged in.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from dppo_tpu.agents.finetune_ppo_gaussian import TrainPPOGaussianAgent

log = logging.getLogger(__name__)


class TrainPPOExactDiffusionAgent(TrainPPOGaussianAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        # diffusion sampling: trajectories only (chains not needed — the
        # exact likelihood scores the final action directly)
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(
                p, c, r, deterministic=det, return_chain=False
            ).trajectories,
            static_argnames=("det",),
        )

