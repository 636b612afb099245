"""Exponential moving average of a parameter pytree.

Parity with the reference EMA helper (`agent/pretrain/train_agent.py:36-56`):
`ema = beta * ema + (1 - beta) * params`, with a warmup phase during which the
EMA is reset to the raw parameters (`step_ema`/`reset_parameters` semantics,
`train_agent.py:140-145`).
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def ema_step(ema_params, params, decay, do_reset):
    """Jit-safe: reset (copy) when `do_reset`, else decay-update."""
    import jax.numpy as jnp

    do_reset = jnp.asarray(do_reset)
    return jax.tree_util.tree_map(
        lambda e, p: jnp.where(do_reset, p, e * decay + p * (1.0 - decay)),
        ema_params,
        params,
    )
