"""Device-resident FIFO transition replay buffer.

The reference's off-policy agents keep python `deque`s of numpy transitions
(`train_dql_diffusion_agent.py:85-89`, `train_sac_agent.py:72-76`). Here the
buffer is a dict of preallocated jnp arrays with a write pointer; insertion
is a jitted scatter at (ptr + arange(n)) % capacity, and sampling indices
are drawn on device — the learner never copies the buffer over the host
boundary after rollout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    data: dict  # name -> (capacity, ...) array
    ptr: jnp.ndarray  # () int32
    size: jnp.ndarray  # () int32


def replay_init(capacity: int, example: dict) -> ReplayState:
    data = {
        k: jnp.zeros((capacity,) + tuple(v.shape), dtype=v.dtype)
        for k, v in example.items()
    }
    return ReplayState(
        data=data,
        ptr=jnp.zeros((), dtype=jnp.int32),
        size=jnp.zeros((), dtype=jnp.int32),
    )


def replay_insert(state: ReplayState, batch: dict) -> ReplayState:
    """Insert n rows (leading axis of every value in `batch`)."""
    n = next(iter(batch.values())).shape[0]
    capacity = next(iter(state.data.values())).shape[0]
    idx = (state.ptr + jnp.arange(n, dtype=jnp.int32)) % capacity
    data = {k: state.data[k].at[idx].set(batch[k]) for k in batch}
    return ReplayState(
        data=data,
        ptr=(state.ptr + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def replay_insert_masked(
    state: ReplayState, batch: dict, mask: jnp.ndarray
) -> ReplayState:
    """Insert only the rows of `batch` where `mask` is True, preserving
    their relative order, under a traced (data-dependent) row count.

    Invalid rows are routed to index `capacity` and dropped by the scatter
    (`mode="drop"`), so duplicate in-bounds indices never occur: each valid
    row gets a distinct ring slot `(ptr + rank) % capacity` where `rank` is
    its position among the valid rows. Precondition (same as
    `replay_insert`): at most `capacity` valid rows per call.
    """
    capacity = next(iter(state.data.values())).shape[0]
    m = mask.astype(jnp.int32)
    n = m.sum()
    rank = jnp.cumsum(m) - 1
    idx = jnp.where(mask, (state.ptr + rank) % capacity, capacity)
    data = {
        k: state.data[k].at[idx].set(batch[k], mode="drop") for k in batch
    }
    return ReplayState(
        data=data,
        ptr=(state.ptr + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def replay_sample_indices(rng, state: ReplayState, batch_size: int):
    return jax.random.randint(
        rng, (batch_size,), 0, jnp.maximum(state.size, 1), dtype=jnp.int32
    )
