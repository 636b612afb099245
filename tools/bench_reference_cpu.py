"""Measured like-for-like baseline: reference torch sampler vs ours, same CPU.

VERDICT r3 (#4): bench.py's vs_baseline denominator was a self-authored
estimate of the reference's throughput. The reference (torch CPU build) is
installed and importable, so measure the real thing: time the reference's
eager K-step chain sampler loop (`/root/reference/dppo/model/diffusion/
diffusion_vpg.py:228-315` VPGDiffusion.forward) at the hopper operating
point (B=40, K=20 DDPM, ft 10, DiffusionMLP [512,512,512] residual) on THIS
host's CPU, and the repo's jitted scan sampler on the SAME CPU, and record
both rates. The measured CPU-vs-CPU ratio isolates the framework/runtime
design (eager per-step dispatch vs one compiled scan) from the hardware;
bench.py reports it alongside the chip number.

Writes BASELINE_MEASURED.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")

B, K, K_FT, TA, DA, OBS = 40, 20, 10, 4, 3, 11
MACRO_STEPS = 20  # sampler calls per timed trial


def bench_reference_torch():
    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(0)
    from dppo.model.common.critic import CriticObs
    from dppo.model.diffusion.diffusion_vpg import VPGDiffusion
    from dppo.model.diffusion.mlp_diffusion import DiffusionMLP

    actor = DiffusionMLP(
        action_dim=DA,
        horizon_steps=TA,
        cond_dim=OBS,
        time_dim=16,
        mlp_dims=[512, 512, 512],
        activation_type="ReLU",
        residual_style=True,
    )
    critic = CriticObs(cond_dim=OBS, mlp_dims=[256, 256, 256])
    model = VPGDiffusion(
        actor=actor,
        critic=critic,
        ft_denoising_steps=K_FT,
        device="cpu",
        horizon_steps=TA,
        obs_dim=OBS,
        action_dim=DA,
        denoising_steps=K,
    )
    model.eval()
    cond = {"state": torch.randn(B, 1, OBS)}
    with torch.no_grad():
        model.forward(cond, deterministic=False, return_chain=True)  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(MACRO_STEPS):
                model.forward(cond, deterministic=False, return_chain=True)
            times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return MACRO_STEPS * B * K / dt


def bench_repo_jax_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from dppo_tpu.diffusion.vpg import VPGDiffusion
    from dppo_tpu.nets.critic import CriticObs
    from dppo_tpu.nets.diffusion_mlp import DiffusionMLP

    actor = DiffusionMLP(
        action_dim=DA,
        horizon_steps=TA,
        cond_dim=OBS,
        time_dim=16,
        mlp_dims=[512, 512, 512],
        activation_type="ReLU",
        residual_style=True,
    )
    critic = CriticObs(cond_dim=OBS, mlp_dims=[256, 256, 256])
    model = VPGDiffusion(
        actor=actor,
        critic=critic,
        ft_denoising_steps=K_FT,
        horizon_steps=TA,
        obs_dim=OBS,
        action_dim=DA,
        denoising_steps=K,
    )
    cond = {"state": jnp.zeros((B, 1, OBS), jnp.float32)}
    params = model.init_vpg_params(jax.random.key(0), cond)
    sample = jax.jit(
        lambda p, c, r: model.sample(p, c, r, deterministic=False, return_chain=True)
    )
    out = sample(params, cond, jax.random.key(1))
    jax.block_until_ready(out)
    times = []
    for t in range(3):
        keys = jax.random.split(jax.random.key(2 + t), MACRO_STEPS)
        t0 = time.perf_counter()
        for k in keys:
            out = sample(params, cond, k)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return MACRO_STEPS * B * K / dt


def main():
    ref_rate = bench_reference_torch()
    repo_rate = bench_repo_jax_cpu()
    result = {
        "host": "shared 2-vCPU build host",
        "operating_point": f"B={B} envs, K={K} DDPM, ft {K_FT}, "
        "DiffusionMLP [512,512,512] residual (hopper finetune)",
        "reference_torch_cpu_denoise_steps_per_s": round(ref_rate, 1),
        "repo_jax_cpu_denoise_steps_per_s": round(repo_rate, 1),
        "cpu_ratio_repo_over_reference": round(repo_rate / ref_rate, 2),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
