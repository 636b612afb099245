"""Learnable DDIM-η modules (flax.linen).

Parity with `model/diffusion/eta.py`: EtaFixed:12 (global scalar via tanh
logit), EtaAction:43 (per-action-dim), EtaState:76 (state-MLP residual around
a base value), EtaStateAction:122 (state-MLP, per-action-dim output). All
return η(cond) with shape (B, 1) or (B, Da), bounded in [min_eta, max_eta].
The MLP variants are initialised so that η(x) = base_eta at init (the
reference xavier-inits every Linear with tiny gain, `eta.py:100-104`; here the
output layer is zero-initialised — same functional effect).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dppo_tpu.nets.mlp import MLP


def _batch(cond):
    data = cond["state"] if "state" in cond else cond["rgb"]
    return data.shape[0]


def _logit_init(base, lo, hi):
    """tanh-logit such that eta(init) == base; the reference allows
    base == max (torch atanh returns inf, tanh(inf) = 1) — clamp instead."""
    x = 2 * (base - lo) / (hi - lo) - 1
    x = min(max(x, -1 + 1e-7), 1 - 1e-7)
    return math.atanh(x)


class EtaFixed(nn.Module):
    base_eta: float = 0.5
    min_eta: float = 0.1
    max_eta: float = 1.0
    # accepted-and-ignored, matching the reference's **kwargs tolerance
    # (eta.py:19 — shipped configs pass MLP args to every eta variant)
    input_dim: Optional[int] = None
    mlp_dims: Optional[Sequence[int]] = None
    action_dim: Optional[int] = None
    gain: Optional[float] = None

    @nn.compact
    def __call__(self, cond):
        init_val = _logit_init(self.base_eta, self.min_eta, self.max_eta)
        logit = self.param(
            "eta_logit", lambda rng: jnp.full((1,), init_val, dtype=jnp.float32)
        )
        eta = 0.5 * (jnp.tanh(logit) + 1) * (self.max_eta - self.min_eta) + self.min_eta
        return jnp.broadcast_to(eta[None, :], (_batch(cond), 1))


class EtaAction(nn.Module):
    action_dim: int
    base_eta: float = 0.5
    min_eta: float = 0.1
    max_eta: float = 1.0
    input_dim: Optional[int] = None  # accepted-and-ignored (see EtaFixed)
    mlp_dims: Optional[Sequence[int]] = None
    gain: Optional[float] = None

    @nn.compact
    def __call__(self, cond):
        init_val = _logit_init(self.base_eta, self.min_eta, self.max_eta)
        logit = self.param(
            "eta_logit",
            lambda rng: jnp.full((self.action_dim,), init_val, dtype=jnp.float32),
        )
        eta = 0.5 * (jnp.tanh(logit) + 1) * (self.max_eta - self.min_eta) + self.min_eta
        return jnp.broadcast_to(eta[None, :], (_batch(cond), self.action_dim))


class _EtaMLP(nn.Module):
    input_dim: int
    mlp_dims: Sequence[int]
    out_dim: int
    activation_type: str = "ReLU"
    out_activation_type: str = "Identity"
    base_eta: float = 0.5
    min_eta: float = 0.1
    max_eta: float = 1.0
    gain: float = 1e-2  # accepted for config parity; zero-init head supersedes it
    action_dim: Optional[int] = None  # accepted-and-ignored (see EtaFixed)

    @nn.compact
    def __call__(self, cond):
        if "rgb" in cond:
            raise NotImplementedError("MLP eta not supported for image obs")
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        h = state
        if self.mlp_dims:
            h = MLP(
                [self.input_dim] + list(self.mlp_dims),
                activation_type=self.activation_type,
                out_activation_type=self.activation_type,
            )(h)
        res = nn.Dense(
            self.out_dim, kernel_init=nn.initializers.zeros, name="eta_head"
        )(h)
        eta = jnp.tanh(res) + self.base_eta
        return jnp.clip(eta, self.min_eta, self.max_eta)


class EtaState(_EtaMLP):
    out_dim: int = 1


def EtaStateAction(input_dim, mlp_dims, action_dim, **kwargs):
    """Factory matching the reference constructor signature (`eta.py:122`)."""
    kwargs.setdefault("base_eta", 1.0)
    kwargs.setdefault("min_eta", 1e-3)
    kwargs.setdefault("max_eta", 2.0)
    kwargs.pop("gain", None)
    return _EtaMLP(input_dim=input_dim, mlp_dims=mlp_dims, out_dim=action_dim, **kwargs)
