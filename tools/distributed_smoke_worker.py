"""Worker for the two-process `jax.distributed` smoke test.

Launched by tests/test_distributed.py as 2 processes x 4 virtual CPU
devices. Exercises the REAL multi-process bring-up path that single-process
mesh tests cannot: `dppo_tpu.parallel.multihost.init_distributed`
rendezvous, a global 8-device `data` mesh spanning both processes,
host-local env-shard assembly into global arrays
(`jax.make_array_from_process_local_data` on each host's
`host_local_slice`), and the fused DPPO update whose gradient psums and
scalar reductions cross the process boundary. Dumps diagnostics + updated
actor params for the parent to compare against a single-process reference.

Usage: distributed_smoke_worker.py <process_id> <num_processes> <coord_addr>
       <out_npz>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, n_proc = int(sys.argv[1]), int(sys.argv[2])
    coord, out = sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var; only the
    # in-process config update reliably forces the CPU backend
    jax.config.update("jax_platforms", "cpu")

    from dppo_tpu.parallel.multihost import host_local_slice, init_distributed

    idx = init_distributed(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )
    assert idx == pid
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * n_proc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent
    from dppo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # spans all processes
    E, S, K_ft, Ta, Da, obs_dim = 16, 4, 4, 4, 3, 11
    agent = TrainPPODiffusionAgent(g._tiny_cfg(E, S))

    # deterministic GLOBAL buffers; each host materializes only its env
    # shard and contributes it to the global array
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((S, E, 1, obs_dim)).astype(np.float32)
    chains = rng.standard_normal((S, E, K_ft + 1, Ta, Da)).astype(np.float32)
    rewards = rng.standard_normal((S, E)).astype(np.float32)
    zeros = np.zeros((S, E), np.float32)
    final_obs = rng.standard_normal((E, 1, obs_dim)).astype(np.float32)
    sl = host_local_slice(E)

    def glob(x, axis):
        spec = [None] * x.ndim
        spec[axis] = "data"
        local = np.take(x, np.arange(sl.start, sl.stop), axis=axis)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), local
        )

    def repl(tree):
        sh = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            tree,
        )

    state = repl(agent.update_state)
    new_state, diag = agent._jit_update(
        state,
        {"state": glob(obs, 1)},
        glob(chains, 1),
        glob(rewards, 1),
        glob(zeros, 1),
        glob(zeros, 1),
        {"state": glob(final_obs, 0)},
        jax.random.key(1),
        jnp.asarray(0, jnp.int32),
    )
    leaves = jax.tree_util.tree_leaves(new_state.params.actor_ft)
    np.savez(
        out,
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        pg_loss=float(diag["pg_loss"]),
        v_loss=float(diag["v_loss"]),
        approx_kl=float(diag["approx_kl"]),
        ratio=float(diag["ratio"]),
        process_count=jax.process_count(),
        device_count=len(jax.devices()),
    )
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
