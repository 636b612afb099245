"""Evaluate pre-trained / DPPO-fine-tuned diffusion policies.

Parity: `agent/eval/eval_diffusion_agent.py:21` (+ the img variant, which
differs only in obs keys handled by the shared rollout).
"""

from __future__ import annotations

from dppo_tpu.agents.eval_base import EvalAgent


class EvalDiffusionAgent(EvalAgent):
    def _load_params(self):
        return self.model.load_eval_params()

    def _act(self, params, cond, rng):
        return self.model.sample(params, cond, rng, deterministic=True).trajectories


class EvalImgDiffusionAgent(EvalDiffusionAgent):
    pass
