"""MLP and residual MLP (flax.linen).

Capability parity with `model/common/mlp.py` (MLP:27, ResidualMLP:84,
TwoLayerPreActivationResNetLinear:128): configurable activations, optional
layernorm/dropout, append-layers for late feature injection, and the
IBC-style two-layer pre-activation residual blocks.

All hidden compute runs in float32 by default; pass `dtype=jnp.bfloat16` to
run matmuls in bf16 on the MXU with float32 params.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

ACTIVATIONS: dict[str, Callable] = {
    "ReLU": nn.relu,
    "ELU": nn.elu,
    "GELU": nn.gelu,
    "Tanh": nn.tanh,
    "Mish": lambda x: x * jnp.tanh(nn.softplus(x)),
    "Identity": lambda x: x,
    "Softplus": nn.softplus,
}


class MLP(nn.Module):
    dim_list: Sequence[int]
    append_dim: int = 0
    append_layers: Optional[Sequence[int]] = None
    activation_type: str = "Tanh"
    out_activation_type: str = "Identity"
    use_layernorm: bool = False
    use_layernorm_final: bool = False
    dropout: float = 0.0
    use_drop_final: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, append=None, *, deterministic: bool = True):
        num_layer = len(self.dim_list) - 1
        act = ACTIVATIONS[self.activation_type]
        out_act = ACTIVATIONS[self.out_activation_type]
        for idx in range(num_layer):
            if (
                append is not None
                and self.append_layers is not None
                and idx in self.append_layers
            ):
                x = jnp.concatenate([x, append], axis=-1)
            x = nn.Dense(self.dim_list[idx + 1], dtype=self.dtype)(x)
            last = idx == num_layer - 1
            if self.use_layernorm and (not last or self.use_layernorm_final):
                x = nn.LayerNorm(dtype=self.dtype)(x)
            if self.dropout > 0 and (not last or self.use_drop_final):
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = out_act(x) if last else act(x)
        return x


class TwoLayerPreActivationResNetLinear(nn.Module):
    hidden_dim: int
    activation_type: str = "Mish"
    use_layernorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation_type]
        x_input = x
        if self.use_layernorm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(act(x))
        if self.use_layernorm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(act(x))
        return x + x_input


class ResidualMLP(nn.Module):
    dim_list: Sequence[int]
    activation_type: str = "Mish"
    out_activation_type: str = "Identity"
    use_layernorm: bool = False
    use_layernorm_final: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden_dim = self.dim_list[1]
        num_hidden_layers = len(self.dim_list) - 3
        assert num_hidden_layers % 2 == 0
        x = nn.Dense(hidden_dim, dtype=self.dtype)(x)
        for _ in range(num_hidden_layers // 2):
            x = TwoLayerPreActivationResNetLinear(
                hidden_dim=hidden_dim,
                activation_type=self.activation_type,
                use_layernorm=self.use_layernorm,
                dtype=self.dtype,
            )(x)
        x = nn.Dense(self.dim_list[-1], dtype=self.dtype)(x)
        if self.use_layernorm_final:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        return ACTIVATIONS[self.out_activation_type](x)
