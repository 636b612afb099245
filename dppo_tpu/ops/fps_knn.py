"""Farthest-point sampling and KNN grouping — JAX/TPU native.

Replaces the pytorch3d CUDA ops `sample_farthest_points` / `knn_points` that
the reference's PointEncoderSA depends on (`model/common/point_encoder.py:4,
215-218`). Static shapes throughout: instead of the reference's dynamic
truncation of zero-padded points (`process_point:188`), invalid points are
carried with a boolean mask — masked out of distance computations — which
keeps the whole pipeline jit/scan compatible (SURVEY §2.9 plan).

FPS is an iterative argmax-of-min-distance scan (O(K·L) per cloud); KNN is
top-k over the (Q, L) pairwise distance matrix — both map onto VPU/MXU
batched ops rather than scalar loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def valid_mask(pts: jnp.ndarray) -> jnp.ndarray:
    """Points whose coordinates are all zero are padding (reference
    `process_point:188` semantics). pts: (..., L, D) -> (..., L) bool."""
    return ~jnp.all(pts == 0, axis=-1)


def farthest_point_sampling(
    rng, pts: jnp.ndarray, k: int, mask: jnp.ndarray | None = None
):
    """pts: (B, L, D); returns (sampled (B, k, D), indices (B, k)).

    Random start point (parity: `sample_gather:207` uses
    random_start_point=True). Invalid points are never selected (masked to
    -inf distance); if fewer than k valid points exist, selections repeat.
    """
    B, L, D = pts.shape
    if mask is None:
        mask = valid_mask(pts)
    n_valid = jnp.maximum(mask.sum(-1), 1)
    start = jax.random.randint(rng, (B,), 0, L) % n_valid
    # map start rank -> index among valid points
    order = jnp.argsort(~mask, axis=-1, stable=True)  # valid indices first
    start_idx = jnp.take_along_axis(order, start[:, None], axis=1)[:, 0]

    init_dist = jnp.where(mask, _BIG, -_BIG)

    def step(carry, _):
        dist, last_idx = carry
        last_pt = jnp.take_along_axis(
            pts, last_idx[:, None, None].repeat(D, -1), axis=1
        )  # (B, 1, D)
        d = jnp.sum((pts - last_pt) ** 2, axis=-1)  # (B, L)
        dist = jnp.minimum(dist, jnp.where(mask, d, -_BIG))
        nxt = jnp.argmax(dist, axis=-1)
        return (dist, nxt), last_idx

    (_, _), idxs = jax.lax.scan(
        step, (init_dist, start_idx), None, length=k
    )
    idxs = jnp.swapaxes(idxs, 0, 1)  # (B, k)
    sampled = jnp.take_along_axis(
        pts, idxs[:, :, None].repeat(D, -1), axis=1
    )
    return sampled, idxs


def knn_gather(
    que: jnp.ndarray, pts: jnp.ndarray, k: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """que: (B, Q, D); pts: (B, L, D) -> neighbors (B, Q, k, D).

    Parity with pytorch3d `knn_points(..., return_nn=True)`: for each query,
    the k nearest (valid) source points.
    """
    B, Q, D = que.shape
    if mask is None:
        mask = valid_mask(pts)
    d2 = jnp.sum(
        (que[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1
    )  # (B, Q, L)
    d2 = jnp.where(mask[:, None, :], d2, _BIG)
    _, nn_idx = jax.lax.top_k(-d2, k)  # (B, Q, k)
    flat = pts[jnp.arange(B)[:, None, None], nn_idx]  # (B, Q, k, D)
    return flat
