"""Worker for the multi-process weak-scaling matrix (VERDICT r3 next #7).

Two modes, identical shapes and identical per-host work:
  dist  — joins an n-process jax.distributed cluster (2 virtual CPU devices
          per process), builds the global data mesh, assembles its
          host-local env shard into global arrays, and times the fused DPPO
          update whose psums cross the process boundary over Gloo (the
          CPU stand-in for DCN).
  solo  — the oversubscription CONTROL: the same process count runs the
          same update on the same per-host shapes with NO distribution
          (each process is its own 2-device world). On this 2-vCPU host
          n>1 processes timeshare the cores; solo isolates that from the
          collective cost, so efficiency_dcn = t_solo / t_dist.

Usage: scaling_worker.py <mode> <pid> <nproc> <coord> <E_local> <S>
       <iters> <out_npz>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1]
    pid, n_proc = int(sys.argv[2]), int(sys.argv[3])
    coord = sys.argv[4]
    e_local, s_steps = int(sys.argv[5]), int(sys.argv[6])
    iters = int(sys.argv[7])
    out = sys.argv[8]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dppo_tpu.parallel.multihost import host_local_slice, init_distributed

    if mode == "dist" and n_proc > 1:
        init_distributed(
            coordinator_address=coord, num_processes=n_proc, process_id=pid
        )
        assert jax.process_count() == n_proc
    E = e_local * (jax.process_count() if mode == "dist" else 1)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent
    from dppo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    K_ft, Ta, Da, obs_dim = 4, 4, 3, 11
    agent = TrainPPODiffusionAgent(g._tiny_cfg(E, s_steps))

    rng = np.random.default_rng(0)
    obs = rng.standard_normal((s_steps, E, 1, obs_dim)).astype(np.float32)
    chains = rng.standard_normal((s_steps, E, K_ft + 1, Ta, Da)).astype(
        np.float32
    )
    rewards = rng.standard_normal((s_steps, E)).astype(np.float32)
    zeros = np.zeros((s_steps, E), np.float32)
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
    args = (
        {"state": glob(obs, 1)},
        glob(chains, 1),
        glob(rewards, 1),
        glob(zeros, 1),
        glob(zeros, 1),
        {"state": glob(final_obs, 0)},
        jax.random.key(1),
        jnp.asarray(0, jnp.int32),
    )
    # warmup/compile
    new_state, diag = agent._jit_update(state, *args)
    jax.block_until_ready(diag)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        new_state, diag = agent._jit_update(state, *args)
        jax.block_until_ready(diag)
        times.append(time.perf_counter() - t0)
    np.savez(
        out,
        times=np.asarray(times),
        median=float(np.median(times)),
        process_count=jax.process_count(),
        device_count=len(jax.devices()),
    )
    print(f"{mode} worker {pid} median {np.median(times):.4f}s", flush=True)


if __name__ == "__main__":
    main()
