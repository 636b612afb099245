"""Compare host env-fabric throughput: process pool vs batched native rollout.

Usage: python tools/bench_env_backends.py [n_envs ...]

Prints env-steps/s (inner env steps, i.e. macro steps × act_steps) for the
reference-shaped multiprocess pool and the batched `mujoco.rollout` backend
at the hopper operating point (act_steps=4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dppo_tpu.envs import make_async

ACT_STEPS = 4
N_MACRO = 50


def bench(venv, n_envs):
    venv.seed(list(range(n_envs)))
    venv.reset_arg()
    a = np.zeros((n_envs, ACT_STEPS, 3), np.float32)
    venv.step(a)  # warm
    t0 = time.perf_counter()
    for _ in range(N_MACRO):
        venv.step(a)
    dt = time.perf_counter() - t0
    venv.close()
    return N_MACRO * ACT_STEPS * n_envs / dt


def main():
    import tempfile, os

    sizes = [int(x) for x in sys.argv[1:]] or [8, 40, 128]
    tmp = tempfile.mkdtemp()
    norm = os.path.join(tmp, "norm.npz")
    np.savez(
        norm,
        obs_min=-2 * np.ones(11),
        obs_max=2 * np.ones(11),
        action_min=-np.ones(3),
        action_max=np.ones(3),
    )
    wrappers = {
        "mujoco_locomotion_lowdim": {"normalization_path": norm},
        "multi_step": {
            "n_obs_steps": 1,
            "n_action_steps": ACT_STEPS,
            "reset_within_step": True,
        },
    }
    for n in sizes:
        rates = {}
        for backend in ["process", "batched_mujoco"]:
            venv = make_async(
                "hopper-medium-v2",
                num_envs=n,
                max_episode_steps=1000,
                backend=backend,
                wrappers=wrappers,
            )
            rates[backend] = bench(venv, n)
        print(
            f"n_envs={n:5d}  process={rates['process']:10.0f} env-steps/s  "
            f"batched={rates['batched_mujoco']:10.0f} env-steps/s  "
            f"speedup={rates['batched_mujoco'] / rates['process']:.1f}x"
        )


if __name__ == "__main__":
    main()
