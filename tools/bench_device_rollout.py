"""Benchmark the fully-fused device rollout (TPU-resident env).

Measures env-steps/s for the flagship DPPO rollout when the env is a JAX
program co-resident with the learner (env.backend=device, Pendulum task):
the whole n_steps rollout — K-step denoising scan + batched env chunk step
per macro-step — is ONE jitted program, so this is the framework's
env-throughput speed of light (no host↔device crossings at all).

Usage: python tools/bench_device_rollout.py [n_envs ...] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_envs", nargs="*", type=int,
                    default=[40, 160, 640, 2560])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n-steps", type=int, default=50)
    ap.add_argument("--act-steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from dppo_tpu.envs.device import DevicePool, PendulumTask

    model = _flagship_model(obs_dim=3, action_dim=1)
    cond = {"state": jnp.zeros((1, 1, 3), jnp.float32)}
    params = model.init_vpg_params(jax.random.key(0), cond)
    S, A = args.n_steps, args.act_steps

    for n_envs in args.n_envs:
        pool = DevicePool(
            PendulumTask(), n_envs=n_envs, n_obs_steps=1, n_action_steps=A,
            max_episode_steps=200, reset_within_step=True,
        )

        def rollout(pool_state, rng):
            def macro(carry, step_rng):
                ps = carry
                samples = model.sample(
                    params, {"state": ps.hist}, step_rng,
                    deterministic=False, return_chain=True,
                )
                ps, out = pool.step_chunk(
                    ps, samples.trajectories[:, :A]
                )
                return ps, out.reward
            return jax.lax.scan(macro, pool_state, jax.random.split(rng, S))

        jrollout = jax.jit(rollout)
        st = jax.jit(pool.reset_all)(jax.random.key(0))
        st, _ = jax.block_until_ready(jrollout(st, jax.random.key(1)))  # compile
        n_iters = 5
        t0 = time.perf_counter()
        for i in range(n_iters):
            st, rew = jrollout(st, jax.random.key(2 + i))
        jax.block_until_ready(rew)
        dt = time.perf_counter() - t0
        env_steps = n_iters * S * n_envs * A
        denoise = n_iters * S * n_envs * model.n_sampling_steps
        print(
            f"n_envs={n_envs:6d}  env-steps/s={env_steps / dt:12,.0f}  "
            f"denoise-steps/s={denoise / dt:12,.0f}  "
            f"iter_ms={dt / n_iters * 1e3:8.2f}"
        )


if __name__ == "__main__":
    main()
