"""Device mesh + sharding helpers.

The reference has no learner-side parallelism at all (single `cuda:0`,
SURVEY §2.8); this module supplies the TPU-native scale-out story:

* a 1-D `data` mesh (extend to (`data`, `model`) when models warrant TP),
* batch tensors sharded on their leading (env / sample) axis over `data`,
* parameters and optimizer state replicated,
* gradients and the three global scalar reductions (running reward variance,
  advantage mean/std, approx-KL) become XLA collectives over ICI/DCN
  automatically when the jitted update consumes sharded inputs.

Usage: agents call `shard_buffers(mesh, ...)` on rollout buffers before the
fused update; `jax.jit` compiles one SPMD program with `psum`s inserted by
XLA — no hand-written collectives needed at these model sizes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_leading_axis(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Place every array with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def shard_axis(mesh: Mesh, tree: Any, axis: int, axis_name: str = "data") -> Any:
    """Shard a specific axis (e.g. axis=1 for (S, E, ...) rollout buffers)."""

    def put(x):
        spec = [None] * x.ndim
        spec[axis] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
