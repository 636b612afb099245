"""Shared agent plumbing: seeding, logging dirs, wandb-optional metrics.

Replaces the scattered setup in the reference agent bases
(`agent/pretrain/train_agent.py:59`, `agent/finetune/train_agent.py:19`).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Optional

import jax

log = logging.getLogger(__name__)


class MetricsLogger:
    """wandb-optional scalar logging + result.pkl parity artifact."""

    def __init__(self, cfg, result_path: Optional[str] = None):
        self.use_wandb = False
        self.result_path = result_path
        self.run_results: list[dict] = []
        wandb_cfg = cfg.get("wandb") if hasattr(cfg, "get") else None
        if wandb_cfg:
            try:
                import wandb

                from dppo_tpu.config import to_container

                wandb.init(
                    entity=wandb_cfg.get("entity"),
                    project=wandb_cfg.get("project"),
                    name=wandb_cfg.get("run"),
                    config=to_container(cfg),
                )
                self.use_wandb = True
                self._wandb = wandb
            except Exception as e:  # wandb not installed / offline
                log.warning("wandb unavailable (%s); logging locally only", e)

    def log(self, metrics: dict, step: int, commit: bool = True):
        if self.use_wandb:
            self._wandb.log(metrics, step=step, commit=commit)

    def append_result(self, record: dict):
        self.run_results.append(record)
        if self.result_path:
            with open(self.result_path, "wb") as f:
                pickle.dump(self.run_results, f)


class BaseAgent:
    def __init__(self, cfg):
        self.cfg = cfg
        self.seed = int(cfg.get("seed", 42))
        self.rng = jax.random.key(self.seed)
        self.logdir = cfg.get("logdir", os.path.join(os.getcwd(), "log"))
        self.checkpoint_dir = os.path.join(self.logdir, "checkpoint")
        os.makedirs(self.checkpoint_dir, exist_ok=True)

    def next_rng(self, n: int = 1):
        keys = jax.random.split(self.rng, n + 1)
        self.rng = keys[0]
        return keys[1] if n == 1 else keys[1:]

    def run(self):
        raise NotImplementedError
