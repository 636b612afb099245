"""Eval-time diffusion model loading fine-tuned checkpoints.

Parity with `model/diffusion/diffusion_eval.py` (DiffusionEval:19): loads a
checkpoint that may hold (a) a fine-tuned VPGParams tree with separate
base/ft actor weights — dispatched per denoising step exactly like training
— or (b) a pretrain `{model, ema}` checkpoint (then `ft_denoising_steps`
must be 0). The reference reconstructs the actors by splitting state-dict
key prefixes (`:36-67`); our checkpoints store structured trees so loading
is direct.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.core import DiffusionModel, Sample, _randn_clipped
from dppo_tpu.diffusion.vpg import VPGParams
from dppo_tpu.utils.ckpt import load_checkpoint


class DiffusionEval(DiffusionModel):
    def __init__(
        self,
        network_path: str,
        ft_denoising_steps: int,
        use_ddim: bool = False,
        **kwargs: Any,
    ):
        super().__init__(use_ddim=use_ddim, network_path=None, **kwargs)
        self.ft_denoising_steps = int(ft_denoising_steps)
        self._ckpt_path = network_path

    def load_eval_params(self) -> VPGParams:
        data = load_checkpoint(self._ckpt_path)
        to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        model = data.get("model")
        if model is not None and hasattr(model, "actor_ft"):
            return VPGParams(
                actor=to_jnp(model.actor),
                actor_ft=to_jnp(model.actor_ft),
                critic=None,
                eta=None,
            )
        # pretrain checkpoint: no fine-tuned split
        assert self.ft_denoising_steps == 0, (
            "If no fine-tuned actor weights are found, ft_denoising_steps "
            "must be 0"
        )
        params = to_jnp(data.get("ema", data.get("model")))
        return VPGParams(actor=params, actor_ft=params, critic=None, eta=None)

    def sample(self, params: VPGParams, cond, rng, deterministic: bool = True):
        """Deterministic eval sampler with per-step base/ft dispatch
        (parity: diffusion_eval.py:70-150 + diffusion.py:262-314)."""
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        K = self.n_sampling_steps
        base_steps = K - self.ft_denoising_steps
        t_all = self.t_schedule()
        index_all = jnp.arange(K, dtype=jnp.int32)
        rng, xr = jax.random.split(rng)
        x0 = jax.random.normal(xr, (B, self.horizon_steps, self.action_dim))

        def make_step(actor_params):
            # static base/ft boundary -> two back-to-back scans each bound
            # to one weight tree (see diffusion/vpg.py sample for why);
            # pixel/point conditions encode once per tree (cond-hoist)
            cond_feat = self.encode_cond_once(actor_params, cond)
            return lambda carry, it: step(actor_params, cond_feat, carry, it)

        def step(actor_params, cond_feat, carry, it):
            x, rng = carry
            i, t = it
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            index_b = jnp.full((B,), i, dtype=jnp.int32)
            mean, logvar = self.p_mean_var(
                actor_params, x, t_b, cond, index=index_b, cond_feat=cond_feat
            )
            std = jnp.exp(0.5 * logvar)
            if self.use_ddim:
                std = jnp.zeros_like(std)
            else:
                if deterministic:
                    std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
                else:
                    std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
            rng, nr = jax.random.split(rng)
            noise = _randn_clipped(nr, x.shape, self.randn_clip_value)
            x = mean + std * noise
            if self.final_action_clip_value is not None:
                x = jnp.where(
                    i == K - 1,
                    jnp.clip(
                        x,
                        -self.final_action_clip_value,
                        self.final_action_clip_value,
                    ),
                    x,
                )
            return (x, rng), None

        carry, _ = jax.lax.scan(
            make_step(self.cast_sampling_params(params.actor)),
            (x0, rng),
            (index_all[:base_steps], t_all[:base_steps]),
        )
        (x, _), _ = jax.lax.scan(
            make_step(self.cast_sampling_params(params.actor_ft)),
            carry,
            (index_all[base_steps:], t_all[base_steps:]),
        )
        return Sample(x, None)

    forward = sample
    __call__ = sample
