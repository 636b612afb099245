"""Weak-scaling benchmark of the fused DPPO training update over a device
mesh (SURVEY §7 step 6: "measure scaling efficiency").

Each device count runs in its own subprocess (device topology is fixed per
process): the per-device workload is constant (envs_per_device), the rollout
buffers are sharded over the env axis, and the fused update is timed after
warmup. Weak-scaling efficiency = t(1) / t(N).

On a real TPU slice, run without flags (`python tools/bench_scaling.py`) —
devices are the slice's chips and the collectives ride ICI. On a CPU host,
virtual devices are forced (`--cpu N,N,...`); with fewer cores than virtual
devices the efficiency numbers reflect core oversubscription, not the
program — the harness, not the host, is the deliverable there.
"""

import json
import os
import subprocess
import sys

ENVS_PER_DEV = 16
STEPS = 8


def worker(n_devices: int):
    import time

    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    import __graft_entry__ as ge
    from dppo_tpu.parallel.mesh import make_mesh, replicate, shard_axis

    mesh = make_mesh(n_devices)
    obs_dim, action_dim, Ta, K_ft = 11, 3, 4, 4
    E = ENVS_PER_DEV * n_devices
    agent_cfg = ge._tiny_cfg(E, STEPS)
    from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent

    agent = TrainPPODiffusionAgent(agent_cfg)
    rng = np.random.default_rng(0)
    obs = {
        "state": shard_axis(
            mesh,
            jnp.asarray(
                rng.standard_normal((STEPS, E, 1, obs_dim)), jnp.float32
            ),
            1,
        )
    }
    chains = shard_axis(
        mesh,
        jnp.asarray(
            rng.standard_normal((STEPS, E, K_ft + 1, Ta, action_dim)),
            jnp.float32,
        ),
        1,
    )
    rewards = shard_axis(
        mesh, jnp.asarray(rng.standard_normal((STEPS, E)), jnp.float32), 1
    )
    zeros = shard_axis(mesh, jnp.zeros((STEPS, E), jnp.float32), 1)
    final_obs = {
        "state": shard_axis(
            mesh,
            jnp.asarray(rng.standard_normal((E, 1, obs_dim)), jnp.float32),
            0,
        )
    }
    state = replicate(mesh, agent.update_state)

    def run(i):
        new_state, diag = agent._jit_update(
            state, obs, chains, rewards, zeros, zeros, final_obs,
            jrandom.key(i), jnp.asarray(0, jnp.int32),
        )
        jax.block_until_ready(diag["pg_loss"])

    run(0)  # compile
    times = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "n_devices": n_devices,
                "envs": E,
                "update_s": float(np.median(times)),
            }
        )
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    counts = [1, 2, 4, 8]
    cpu = "--cpu" in sys.argv
    rows = []
    for n in counts:
        env = dict(os.environ)
        if cpu:
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}"
            )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n_devices={n}: FAILED\n{out.stderr[-2000:]}")
            continue
        rows.append(json.loads(line[-1]))
    if not rows:
        return
    t1 = rows[0]["update_s"]
    for r in rows:
        eff = t1 / r["update_s"]
        print(
            f"devices={r['n_devices']:2d}  envs={r['envs']:4d}  "
            f"update={r['update_s'] * 1e3:8.1f} ms  "
            f"weak-scaling efficiency={eff:.2f}"
        )


if __name__ == "__main__":
    main()
