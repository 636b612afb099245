"""Behavior-cloning pretraining of a diffusion policy.

Capability parity with `agent/pretrain/train_agent.py:59` (PreTrainAgent) +
`agent/pretrain/train_diffusion_agent.py:15` (TrainDiffusionAgent): AdamW +
cosine-warmup-restarts schedule stepped per epoch, EMA updated every
`update_ema_freq` batches with reset before `epoch_start_ema`, train/val
split, `{epoch, model, ema}` checkpoints.

TPU-first: the ENTIRE epoch is one jitted program — a `lax.scan` over
shuffled minibatch gathers from the device-resident dataset (the reference
runs a Python DataLoader loop with one optimizer step per dispatch,
`train_diffusion_agent.py:29-44`). Sharding: params replicated, batch sharded
over the `data` mesh axis when a mesh is provided.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dppo_tpu.agents.base import BaseAgent, MetricsLogger
from dppo_tpu.config import instantiate
from dppo_tpu.utils.ckpt import save_checkpoint
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class PretrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    cnt_batch: jnp.ndarray  # () int32 — global batch counter for EMA cadence


class TrainDiffusionAgent(BaseAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.model = instantiate(cfg.model)
        self.dataset = instantiate(cfg.train_dataset)
        self.n_epochs = int(cfg.train.n_epochs)
        self.batch_size = int(cfg.train.batch_size)
        self.epoch_start_ema = int(cfg.train.get("epoch_start_ema", 20))
        self.update_ema_freq = int(cfg.train.get("update_ema_freq", 10))
        self.val_freq = int(cfg.train.get("val_freq", 100))
        self.log_freq = int(cfg.train.get("log_freq", 1))
        self.save_model_freq = int(cfg.train.save_model_freq)
        self.ema_decay = float(cfg.ema.decay)

        self.val_indices = None
        train_split = float(cfg.train.get("train_split", 1.0))
        if train_split < 1.0:
            self.val_indices = self.dataset.set_train_val_split(
                train_split, self.next_rng()
            )

        example = self.dataset.get_batch(jnp.zeros((2,), dtype=jnp.int32))
        self.params = self.model.init_params(
            self.next_rng(), cond=example.conditions
        )
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(self.params)
        )
        log.info("Number of network parameters: %d", n_params)

        lr_cfg = cfg.train.lr_scheduler
        self.lr_schedule = cosine_warmup_restarts(
            max_lr=float(cfg.train.learning_rate),
            min_lr=float(lr_cfg.min_lr),
            first_cycle_steps=int(lr_cfg.first_cycle_steps),
            warmup_steps=int(lr_cfg.warmup_steps),
        )
        self.n_batches = max(1, len(self.dataset) // self.batch_size)
        # reference steps the lr scheduler once per EPOCH; optax counts
        # updates, so divide the count down to epochs
        per_update = lambda count: self.lr_schedule(count // self.n_batches)
        self.optimizer = optax.adamw(
            learning_rate=per_update,
            weight_decay=float(cfg.train.get("weight_decay", 0.0)),
        )
        self.state = PretrainState(
            params=self.params,
            ema_params=jax.tree_util.tree_map(jnp.copy, self.params),
            opt_state=self.optimizer.init(self.params),
            cnt_batch=jnp.zeros((), dtype=jnp.int32),
        )
        self.logger = MetricsLogger(cfg)
        self._epoch_step = jax.jit(self._epoch_step_impl, static_argnames=("do_ema_reset",))

    # ---- one full epoch as a single XLA program ----
    def _epoch_step_impl(
        self, state: PretrainState, rng, do_ema_reset: bool, data=None
    ):
        # `data` threads the dataset's bulk arrays through jit as REAL
        # arguments: traced here, swapped in for the gathers, restored
        # after. Closing over them instead inlines hundreds of MB of pixel
        # data into the compile payload (axon tunnel rejects with HTTP 413).
        if data is not None:
            saved = self.dataset.swap_arrays(data)
            try:
                return self._epoch_step_impl(state, rng, do_ema_reset)
            finally:
                self.dataset.swap_arrays(saved)
        n = len(self.dataset)
        perm_rng, loss_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)
        n_used = self.n_batches * self.batch_size
        batch_idx = perm[:n_used].reshape(self.n_batches, self.batch_size)

        def one_batch(carry, xs):
            state = carry
            idx, sub = xs
            batch = self.dataset.get_batch(idx)
            loss, grads = jax.value_and_grad(self.model.loss)(
                state.params, sub, batch.actions, batch.conditions
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            do_update_ema = state.cnt_batch % self.update_ema_freq == 0
            if do_ema_reset:
                ema = jax.tree_util.tree_map(
                    lambda e, p: jnp.where(do_update_ema, p, e),
                    state.ema_params,
                    params,
                )
            else:
                ema = jax.tree_util.tree_map(
                    lambda e, p: jnp.where(
                        do_update_ema,
                        e * self.ema_decay + p * (1.0 - self.ema_decay),
                        e,
                    ),
                    state.ema_params,
                    params,
                )
            return (
                PretrainState(params, ema, opt_state, state.cnt_batch + 1),
                loss,
            )

        subkeys = jax.random.split(loss_rng, self.n_batches)
        state, losses = jax.lax.scan(one_batch, state, (batch_idx, subkeys))
        return state, jnp.mean(losses)

    def _val_loss(self, state, rng):
        starts, num_before = self.val_indices
        n = int(starts.shape[0])
        if n == 0:
            return None
        saved = (self.dataset.starts, self.dataset.num_before)
        self.dataset.set_indices(self.val_indices)
        nb = min(n, 4096)
        batch = self.dataset.get_batch(jnp.arange(nb, dtype=jnp.int32))
        loss = self.model.loss(
            state.ema_params, rng, batch.actions, batch.conditions
        )
        self.dataset.set_indices(saved)
        return float(loss)

    def save_model(self, epoch: int):
        path = os.path.join(self.checkpoint_dir, f"state_{epoch}.pkl")
        save_checkpoint(
            path,
            {
                "epoch": epoch,
                "model": self.state.params,
                "ema": self.state.ema_params,
            },
        )
        log.info("Saved model to %s", path)

    def run(self):
        timer = Timer()
        for epoch in range(1, self.n_epochs + 1):
            rng = self.next_rng()
            self.state, loss_train = self._epoch_step(
                self.state,
                rng,
                do_ema_reset=epoch < self.epoch_start_ema,
                data=self.dataset.arrays(),
            )
            loss_val = None
            if self.val_indices is not None and epoch % self.val_freq == 0:
                loss_val = self._val_loss(self.state, self.next_rng())
            if epoch % self.save_model_freq == 0 or epoch == self.n_epochs:
                self.save_model(epoch)
            if epoch % self.log_freq == 0:
                loss_train = float(loss_train)
                log.info(
                    "%d: train loss %8.4f | t: %8.4f", epoch, loss_train, timer()
                )
                metrics = {"loss - train": loss_train}
                if loss_val is not None:
                    metrics["loss - val"] = loss_val
                self.logger.log(metrics, step=epoch)
        return self.state
