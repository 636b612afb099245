"""Two-process `jax.distributed` smoke test.

Every other multi-device proof in the suite runs in ONE process (8 virtual
devices); this is the only place the DCN-side bring-up actually executes:
two OS processes x 4 virtual CPU devices rendezvous through
`init_distributed`, build one global 8-device `data` mesh, assemble
host-local env shards into global arrays, and run the fused DPPO update
whose gradient psums cross the process boundary. The result must match the
single-process update numerically."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "distributed_smoke_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_update_matches_single_process(tmp_path):
    # single-process reference (this process: 8 virtual devices, no mesh —
    # plain single-program update on unsharded buffers)
    import __graft_entry__ as g
    from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent

    E, S, K_ft, Ta, Da, obs_dim = 16, 4, 4, 4, 3, 11
    agent = TrainPPODiffusionAgent(g._tiny_cfg(E, S))
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((S, E, 1, obs_dim)).astype(np.float32)
    chains = rng.standard_normal((S, E, K_ft + 1, Ta, Da)).astype(np.float32)
    rewards = rng.standard_normal((S, E)).astype(np.float32)
    zeros = np.zeros((S, E), np.float32)
    final_obs = rng.standard_normal((E, 1, obs_dim)).astype(np.float32)
    ref_state, ref_diag = agent._jit_update(
        agent.update_state,
        {"state": jnp.asarray(obs)},
        jnp.asarray(chains),
        jnp.asarray(rewards),
        jnp.asarray(zeros),
        jnp.asarray(zeros),
        {"state": jnp.asarray(final_obs)},
        jax.random.key(1),
        jnp.asarray(0, jnp.int32),
    )
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params.actor_ft)

    # two real processes, 4 local devices each
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", coord, outs[i]],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, text in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"

    for out in outs:
        data = np.load(out)
        assert int(data["process_count"]) == 2
        assert int(data["device_count"]) == 8
        for k in ("pg_loss", "v_loss", "approx_kl", "ratio"):
            np.testing.assert_allclose(
                float(data[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"{k} diverged across the process boundary",
            )
        for i, ref in enumerate(ref_leaves):
            np.testing.assert_allclose(
                data[f"leaf_{i}"], np.asarray(ref), rtol=2e-4, atol=2e-5
            )
