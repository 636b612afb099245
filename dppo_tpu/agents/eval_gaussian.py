"""Evaluate Gaussian policies (parity: `agent/eval/eval_gaussian_agent.py`)."""

from __future__ import annotations

import jax

from dppo_tpu.agents.eval_base import EvalAgent


class EvalGaussianAgent(EvalAgent):
    def _load_params(self):
        params = self.model.load_params(rng=jax.random.key(self.seed))
        # fine-tuned checkpoints store a params tree with an actor_ft leaf
        if hasattr(params, "actor_ft"):
            return params.actor_ft
        return params

    def _act(self, params, cond, rng):
        return self.model.forward(params, cond, rng, deterministic=True)


class EvalImgGaussianAgent(EvalGaussianAgent):
    pass
