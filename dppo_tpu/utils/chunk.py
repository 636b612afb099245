"""Chunked application of a jittable function over a large leading axis.

The reference streams its value/old-logprob recompute in
`logprob_batch_size` chunks to bound peak activation memory
(`agent/finetune/train_ppo_agent.py:22-25`, used at
`train_ppo_diffusion_agent.py:202-240`). Inside a fused XLA program the
equivalent is a `lax.scan` over fixed-size chunks: only one chunk's
activations are live at a time, trading a tiny scheduling overhead for an
S·E-independent activation footprint — which is what keeps the robomimic
pixel operating point (50 envs x 300 steps of image history through a ViT)
inside a v5e's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_apply(fn, chunk_size: int, *args):
    """Apply `fn` over the leading axis of every array leaf in `args` in
    fixed-size chunks via `lax.scan`, concatenating the outputs.

    `fn(*chunk_args)` must return a pytree of arrays whose leading axis
    matches the chunk's. With `chunk_size <= 0` or `>= n` this is exactly
    `fn(*args)` (single full-batch call). The last chunk is zero-padded to
    static shape; padded rows are computed and sliced off, so `fn` must be
    row-independent (elementwise over the leading axis), which value and
    log-prob recomputes are.
    """
    leaves = jax.tree_util.tree_leaves(args)
    n = leaves[0].shape[0]
    if chunk_size <= 0 or chunk_size >= n:
        return fn(*args)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n

    def prep(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return x.reshape((n_chunks, chunk_size) + x.shape[1:])

    args_c = jax.tree_util.tree_map(prep, args)

    def step(_, xs):
        return None, fn(*xs)

    _, out = jax.lax.scan(step, None, args_c)
    return jax.tree_util.tree_map(
        lambda y: y.reshape((n_chunks * chunk_size,) + y.shape[2:])[:n], out
    )
