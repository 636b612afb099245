"""Drive the shipped robomimic-can PIXEL finetune config END-TO-END on the
chip at the FULL reference operating point (VERDICT r4 #6): 50 envs, 96x96
frames, K=100 -> DDIM-5, grad_accumulate 15, ViT-128 + SpatialEmb-128 +
[512,512,512] trunk (`cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp_img.yaml:
34,59,14-17` — the memory/compile stress case the reference actually ships).
The robomimic sim is not installable here, so the env side runs on the
fake-sim double (`envs/fake_sim.py`, API-exact); every device-side tensor
(obs buffers, chains, ViT activations, accumulated grads) is at the real
operating point. Reports per-iteration wall time and the chip's HBM
high-water mark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_itr = int(os.environ.get("N_ITR", "3"))
    out_dir = os.environ.get("OUT", "/root/repo/runs/robomimic_pixel_drive")
    os.makedirs(out_dir, exist_ok=True)
    norm = os.path.join(out_dir, "norm.npz")
    np.savez(
        norm,
        obs_min=np.full(9, -2.0, np.float32),
        obs_max=np.full(9, 2.0, np.float32),
        action_min=np.full(7, -2.0, np.float32),
        action_max=np.full(7, 2.0, np.float32),
    )

    from dppo_tpu.config import get_class, load_config

    cfg = load_config(
        "/root/repo/cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp_img.yaml",
        overrides=[
            f"logdir={out_dir}/ft",
            "base_policy_path=null",
            f"normalization_path={norm}",
            "env.fake_sim=true",
            "model.network_path=null",
            f"train.n_train_itr={n_itr}",
            # the shipped config ties first_cycle_steps to n_train_itr; at a
            # 3-iteration drive that violates warmup_steps < first_cycle_steps
            "train.actor_lr_scheduler.first_cycle_steps=1000",
            "train.critic_lr_scheduler.first_cycle_steps=1000",
            f"train.val_freq={n_itr + 1}",
            f"train.save_model_freq={n_itr + 1}",
            "train.n_critic_warmup_itr=0",
        ],
    )
    agent = get_class(cfg._target_)(cfg)

    import jax

    t0 = time.perf_counter()
    agent.run()
    total = time.perf_counter() - t0

    dev = jax.local_devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {
            "bytes_in_use": ms.get("bytes_in_use"),
            "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
            "bytes_limit": ms.get("bytes_limit"),
        }
    except Exception as e:  # tunnel backends may not expose memory stats
        stats = {"error": str(e)}
    if not any(v is not None for v in stats.values()):
        # the axon tunnel exposes no allocator stats; report the RESIDENT
        # device footprint (live arrays) as a lower bound on HBM use and
        # say so rather than printing nulls
        resident = sum(
            a.size * a.dtype.itemsize for a in jax.live_arrays()
        )
        stats = {
            "note": "tunnel exposes no allocator stats; resident live-array"
            " bytes reported (lower bound on peak)",
            "resident_bytes": int(resident),
        }

    # steady-state step time: per-iteration wall clock from the agent's own
    # result log, skipping itr 0 (which absorbs the XLA compiles)
    import pickle

    with open(os.path.join(out_dir, "ft", "result.pkl"), "rb") as f:
        rlog = pickle.load(f)
    itr_times = [row["time"] for row in rlog]
    steady = itr_times[1:] or itr_times

    result = {
        "config": "cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp_img.yaml",
        "operating_point": "50 envs x n_steps, 96x96, K=100 DDIM-5, accum 15",
        "n_train_itr": n_itr,
        "total_wall_s": round(total, 1),
        "itr_wall_s": [round(t, 1) for t in itr_times],
        "steady_state_s_per_itr": round(sum(steady) / len(steady), 1),
        "platform": dev.platform,
        "hbm": stats,
    }
    path = os.path.join(out_dir, "drive_result.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
