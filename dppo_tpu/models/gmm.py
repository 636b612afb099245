"""GMM policy model — pure-functional mixture-of-Gaussians over action chunks.

Capability parity with `model/common/gmm.py` (GMMModel:13): BC loss (:40),
mixture distribution builder with approximate entropy (:56), sampler (:92).
The torch MixtureSameFamily is replaced by explicit logsumexp math.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2 * math.pi)


def gmm_log_prob(x, means, scales, logits):
    """x: (B, D); means/scales: (B, M, D); logits: (B, M) -> (B,)."""
    comp_logprob = (
        -0.5 * ((x[:, None, :] - means) / scales) ** 2
        - jnp.log(scales)
        - 0.5 * LOG_2PI
    ).sum(-1)  # (B, M) independent product over D
    log_mix = jax.nn.log_softmax(logits, axis=-1)
    return jax.nn.logsumexp(log_mix + comp_logprob, axis=-1)


def gmm_stats(means, scales, logits):
    """Approximate entropy and mean std (parity: gmm.py:74-80)."""
    comp_entropy = (0.5 + 0.5 * LOG_2PI + jnp.log(scales)).sum(-1)  # (B, M)
    w = jax.nn.softmax(logits, axis=-1)
    approx_entropy = jnp.mean(jnp.sum(w * comp_entropy, axis=-1))
    std = jnp.mean(jnp.sum(w * scales.mean(-1), axis=-1))
    return approx_entropy, std


def gmm_sample(rng, means, scales, logits):
    B, M, D = means.shape
    rng_mode, rng_noise = jax.random.split(rng)
    mode = jax.random.categorical(rng_mode, logits, axis=-1)  # (B,)
    mean = jnp.take_along_axis(means, mode[:, None, None], axis=1)[:, 0]
    scale = jnp.take_along_axis(scales, mode[:, None, None], axis=1)[:, 0]
    return mean + scale * jax.random.normal(rng_noise, (B, D))


class GMMModel:
    def __init__(
        self,
        network,
        horizon_steps: int,
        network_path: Optional[str] = None,
        device: Optional[str] = None,
        **kwargs: Any,
    ):
        self.network = network
        self.horizon_steps = int(horizon_steps)
        self.network_path = network_path

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

    def forward_train(self, params, cond, deterministic: bool = False):
        means, scales, logits = self.network.apply(params, cond)
        if deterministic:
            scales = jnp.full_like(means, 1e-4)
        return means, scales, logits

    def loss(self, params, true_action, cond, ent_coef: float = 0.0, **kwargs):
        # ent_coef accepted (and ignored) so the shared pretrain agent can
        # call gaussian/GMM losses uniformly; the reference GMM BC loss has
        # no entropy term (gmm.py:72-80)
        B = true_action.shape[0]
        means, scales, logits = self.forward_train(params, cond)
        nll = -gmm_log_prob(true_action.reshape(B, -1), means, scales, logits)
        entropy, _ = gmm_stats(means, scales, logits)
        return nll.mean(), {"entropy": entropy}

    def forward(self, params, cond, rng, deterministic: bool = False):
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        means, scales, logits = self.forward_train(
            params, cond, deterministic=deterministic
        )
        sample = gmm_sample(rng, means, scales, logits)
        return sample.reshape(B, self.horizon_steps, -1)

    __call__ = forward
