"""Distill the solved STATE pendulum policy into EXPERT pixel demos.

VERDICT r4 #1: the reference's pixel recipes exclusively fine-tune expert
BC policies (reference `script/run.py:67-78` downloads pretrained
checkpoints; `cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp_img.yaml:19-25`
fine-tunes them at K=100 -> DDIM 5, 96x96). Four rounds of from-scratch
pixel campaigns here established the stall is exploration/credit
assignment, not the vision stack — so this script reproduces the
reference's actual regime: roll out the 96%-success DDIM state policy
(r3 evidence, `artifacts/pendulum/ddim_fixed_state_299.pkl`), render its
trajectories with the same pure-jnp rasterizer the device env uses, keep
only SUCCESSFUL episodes, and emit the stitched npz the 96x96 pixel BC
pretrain consumes (`cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml`).

Output schema matches `data/synthetic.py collect_pendulum_pixel_demos`:
`states` (T,1) = thdot/8 (PendulumPixelsTask.split_obs proprio), `images`
(T,3,H,W) float32 [0,1], `actions` (T,1) canonical [-1,1], `traj_lengths`.

Usage: python tools/distill_pixel_expert.py [--episodes 40] [--out runs/pixels96_expert]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=40, help="successful episodes to keep")
    ap.add_argument("--out", default="/root/repo/runs/pixels96_expert")
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32, help="parallel host envs")
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument(
        "--ckpt", default="/root/repo/artifacts/pendulum/ddim_fixed_state_299.pkl"
    )
    ap.add_argument(
        "--norm", default="/root/repo/artifacts/pendulum/normalization.npz"
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import gymnasium
    import jax
    import jax.numpy as jnp

    from dppo_tpu.config import load_config, instantiate
    from dppo_tpu.envs.device.pendulum import render_pendulum_rgb
    from dppo_tpu.envs.wrappers.mujoco_locomotion import normalize_obs

    # the checkpoint was fine-tuned with DDIM-5 sampling; evaluate it the
    # same way (diffusion/eval.py sets std=0 on the DDIM branch)
    cfg = load_config(
        "/root/repo/cfg/gym/eval/pendulum-v1/eval_diffusion_mlp.yaml",
        overrides=[
            f"base_policy_path={args.ckpt}",
            f"normalization_path={args.norm}",
            "model.use_ddim=true",
            "model.ddim_steps=5",
            f"logdir={args.out}/distill_eval",  # avoid the DPPO_LOG_DIR env interpolation
        ],
    )
    model = instantiate(cfg.model)
    params = model.load_eval_params()

    norm = np.load(args.norm)
    obs_min, obs_max = norm["obs_min"], norm["obs_max"]
    act_min, act_max = norm["action_min"], norm["action_max"]
    max_speed = 8.0

    B = args.batch
    act_steps = int(cfg.act_steps)
    n_chunks = args.max_steps // act_steps

    @jax.jit
    def act_fn(p, cond, rng):
        return model.sample(p, cond, rng, deterministic=True).trajectories

    rng = jax.random.PRNGKey(args.seed)
    kept_s, kept_a, kept_i, lengths = [], [], [], []
    batch_idx = 0
    while len(lengths) < args.episodes:
        envs = [gymnasium.make("Pendulum-v1") for _ in range(B)]
        obs = np.stack(
            [e.reset(seed=args.seed + 1000 * batch_idx + i)[0] for i, e in enumerate(envs)]
        ).astype(np.float32)
        ep_s = np.zeros((B, args.max_steps, 1), np.float32)
        ep_a = np.zeros((B, args.max_steps, 1), np.float32)
        ep_i = np.zeros((B, args.max_steps, 3, args.img, args.img), np.float32)
        ep_r = np.zeros((B, n_chunks), np.float32)
        for c in range(n_chunks):
            cond = {
                "state": jnp.asarray(
                    normalize_obs(obs, obs_min, obs_max)[:, None, :]
                )
            }
            rng, sub = jax.random.split(rng)
            chunk = np.asarray(act_fn(params, cond, sub))[:, :act_steps]
            for k in range(act_steps):
                t = c * act_steps + k
                cos, sin, thdot = obs[:, 0], obs[:, 1], obs[:, 2]
                ep_s[:, t, 0] = thdot / max_speed
                frames = jax.vmap(
                    lambda cs: render_pendulum_rgb(cs, args.img, args.img)
                )(jnp.stack([cos, sin], axis=-1))
                ep_i[:, t] = np.asarray(frames)
                a = np.clip(chunk[:, k], -1, 1)
                ep_a[:, t] = a
                raw = ((a + 1) / 2.0) * (act_max - act_min) + act_min
                for b, e in enumerate(envs):
                    o, r, *_ = e.step(raw[b])
                    obs[b] = o
                    ep_r[b, c] += r
        for e in envs:
            e.close()
        # framework success criterion (agents/finetune_base.py:199): best
        # chunk reward / act_steps >= threshold (-0.1 for pendulum)
        best = ep_r.max(axis=1) / act_steps
        for b in range(B):
            if best[b] >= -0.1 and len(lengths) < args.episodes:
                kept_s.append(ep_s[b])
                kept_a.append(ep_a[b])
                kept_i.append(ep_i[b])
                lengths.append(args.max_steps)
        print(
            f"batch {batch_idx}: success {(best >= -0.1).mean():.2f} "
            f"(kept {len(lengths)}/{args.episodes})",
            flush=True,
        )
        batch_idx += 1
        if batch_idx > 10:
            raise RuntimeError("source policy success rate far below expectation")

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "train.npz")
    np.savez(
        path,
        states=np.concatenate(kept_s),
        actions=np.concatenate(kept_a),
        images=np.concatenate(kept_i),
        traj_lengths=np.asarray(lengths),
    )
    print(f"wrote {path}: {len(lengths)} expert episodes, "
          f"{sum(lengths)} frames @ {args.img}x{args.img}", flush=True)


if __name__ == "__main__":
    main()
