"""Behavior-cloning pretraining of Gaussian/GMM policies.

Parity with `agent/pretrain/train_gaussian_agent.py:15` (TrainGaussianAgent):
the diffusion pretrain loop with an entropy-coefficient BC loss. Works for
both GaussianModel and GMMModel (same loss signature).
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from dppo_tpu.agents.pretrain_diffusion import PretrainState, TrainDiffusionAgent

log = logging.getLogger(__name__)


class TrainGaussianAgent(TrainDiffusionAgent):
    def __init__(self, cfg):
        self.ent_coef = float(cfg.train.get("ent_coef", 0.0))
        super().__init__(cfg)

    # model interface differs: init_params takes cond only; loss signature
    # is loss(params, actions, cond, ent_coef)
    def _model_init(self, rng, cond):
        return self.model.init_params(rng, cond)

    def _model_loss(self, params, rng, actions, cond):
        loss, _ = self.model.loss(params, actions, cond, self.ent_coef)
        return loss

    def _epoch_step_impl(
        self, state: PretrainState, rng, do_ema_reset: bool, data=None
    ):
        # see TrainDiffusionAgent._epoch_step_impl: thread bulk dataset
        # arrays through jit instead of closing over them
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
            loss, grads = jax.value_and_grad(self._model_loss)(
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
        if self.val_indices is None:
            return None
        saved = (self.dataset.starts, self.dataset.num_before)
        self.dataset.set_indices(self.val_indices)
        n = int(self.dataset.starts.shape[0])
        if n == 0:
            self.dataset.set_indices(saved)
            return None
        nb = min(n, 4096)
        batch = self.dataset.get_batch(jnp.arange(nb, dtype=jnp.int32))
        loss = self._model_loss(
            state.ema_params, rng, batch.actions, batch.conditions
        )
        self.dataset.set_indices(saved)
        return float(loss)
