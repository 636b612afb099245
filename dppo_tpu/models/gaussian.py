"""Gaussian policy model — pure-functional (flax params external).

Capability parity with `model/common/gaussian.py` (GaussianModel:13): BC loss
with entropy bonus (:49), distribution builder (:67), sampler with randn-clip
and optional tanh squash + logprob correction for SAC (:85-120).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2 * math.pi)


def normal_logprob(x, mean, scale):
    return -0.5 * ((x - mean) / scale) ** 2 - jnp.log(scale) - 0.5 * LOG_2PI


def normal_entropy(scale):
    return 0.5 + 0.5 * LOG_2PI + jnp.log(scale)


class GaussianModel:
    def __init__(
        self,
        network,
        horizon_steps: int,
        network_path: Optional[str] = None,
        device: Optional[str] = None,
        randn_clip_value: float = 10.0,
        tanh_output: bool = False,
        **kwargs: Any,
    ):
        self.network = network
        self.horizon_steps = int(horizon_steps)
        self.network_path = network_path
        self.randn_clip_value = randn_clip_value
        self.tanh_output = tanh_output

    # ---------- params ----------
    def init_params(self, rng, cond: dict):
        return self.network.init(rng, cond)

    def load_params(self, rng=None, cond: Optional[dict] = None):
        from dppo_tpu.utils.ckpt import load_checkpoint

        if self.network_path is not None:
            data = load_checkpoint(self.network_path)
            params = data.get("model", data.get("ema"))
            return jax.tree_util.tree_map(jnp.asarray, params)
        assert rng is not None
        return self.init_params(rng, cond)

    # ---------- distribution ----------
    def forward_train(
        self, params, cond, deterministic: bool = False, network_override=None
    ):
        net = network_override if network_override is not None else self.network
        mean, scale = net.apply(params, cond)
        if deterministic:
            scale = jnp.full_like(mean, 1e-4)
        return mean, scale

    # ---------- BC loss ----------
    def loss(self, params, true_action, cond, ent_coef: float = 0.0):
        # per-ELEMENT means, not per-sample sums: torch D.Normal.log_prob /
        # .entropy() are elementwise and the reference means over (B, D)
        # (gaussian.py:60-65; pinned by tests/test_reference_parity_more.py)
        B = true_action.shape[0]
        mean, scale = self.forward_train(params, cond, deterministic=False)
        flat = true_action.reshape(B, -1)
        nll = -normal_logprob(flat, mean, scale)
        entropy = normal_entropy(scale).mean()
        return nll.mean() - entropy * ent_coef, {"entropy": entropy}

    # ---------- sampling ----------
    def forward(
        self,
        params,
        cond,
        rng,
        deterministic: bool = False,
        network_override=None,
        get_logprob: bool = False,
    ):
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        T = self.horizon_steps
        mean, scale = self.forward_train(
            params, cond, deterministic=deterministic,
            network_override=network_override,
        )
        noise = jax.random.normal(rng, mean.shape)
        sample = mean + scale * noise
        sample = jnp.clip(
            sample,
            mean - self.randn_clip_value * scale,
            mean + self.randn_clip_value * scale,
        )
        if get_logprob:
            logprob = normal_logprob(sample, mean, scale)
            if self.tanh_output:
                sample = jnp.tanh(sample)
                logprob = logprob - jnp.log(1 - sample**2 + 1e-6)
            return sample.reshape(B, T, -1), logprob.sum(-1)
        if self.tanh_output:
            sample = jnp.tanh(sample)
        return sample.reshape(B, T, -1)

    __call__ = forward
