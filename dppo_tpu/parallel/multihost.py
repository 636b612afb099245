"""Multi-host bring-up.

The reference has no multi-node path at all (SURVEY §4, §2.8); this module
supplies it TPU-natively: `init_distributed()` wires `jax.distributed` from
standard cluster env vars (or explicit args), after which `jax.devices()`
spans the slice and the `data` mesh from :mod:`dppo_tpu.parallel.mesh`
covers all chips — gradients and the three global scalar reductions
(running reward variance, advantage mean/std, approx-KL) ride ICI within a
slice and DCN across slices via ordinary XLA collectives.

Per-host env pools stay host-local: each host steps `n_envs / n_hosts`
simulators and contributes its shard of the rollout buffers
(`host_local_slice`). Single-host test recipe:
`XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`.
"""

from __future__ import annotations

import logging
from typing import Optional

log = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (no-op for single-process). Returns the
    process index."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()  # env-driven (TPU pods auto-detect)
        except Exception as e:  # single-process / no cluster env
            log.debug("jax.distributed not initialized (%s)", e)
    return jax.process_index()


def host_local_slice(n_total: int) -> slice:
    """The [start, stop) range of global env indices owned by this host."""
    import jax

    n_hosts = jax.process_count()
    idx = jax.process_index()
    base, extra = divmod(n_total, n_hosts)
    start = idx * base + min(idx, extra)
    stop = start + base + (1 if idx < extra else 0)
    return slice(start, stop)
