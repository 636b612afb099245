"""Pallas TPU kernel: the ENTIRE K-step denoising chain (DDPM or DDIM) in
one kernel.

This is the hot op of DPPO (SURVEY §3.3): K sequential forwards of a small
residual-MLP denoiser per policy query. Under plain XLA the K-step
`lax.scan` re-reads the MLP weights from HBM every iteration and pays
per-iteration scheduling; this kernel pins ALL weights (~2 MB for the
hopper flagship [512,512,512]) plus the schedule tables in VMEM and runs
the full reverse process — network forward, x₀ reconstruction + clip,
posterior mean, noise injection — in a single `fori_loop`, writing the
denoising chain as it goes.

Supported network shape: DiffusionMLP with `residual_style=True`,
`mlp_dims` of any odd length 2n+1 with equal widths (n two-layer
pre-activation residual blocks, stacked on a leading axis and unrolled
statically inside the kernel), no layernorm, ReLU or Mish activation,
optionally a cond MLP — the reference's gym / robomimic / d3il
state-policy architectures at any depth
(`cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml:91`). The per-step
time embeddings (a function of the static timestep only), the cond-MLP
state embedding (a function of the query's observation only, computed per
actor since base/ft own separate cond-MLP weights), and the per-step
posterior coefficients are all precomputed outside the kernel. Everything
else is validated at construction — unsupported models raise rather than
silently computing the wrong function.

Noise is supplied as an input (generated with `jax.random.normal` outside),
so fused and unfused samplers agree bit-for-bit given the same draws
(verified in `tests/test_fused_chain.py`, interpreter mode).

NOTE: the development environment's experimental `axon` tunnel backend cannot
compile Pallas/Mosaic kernels (even trivial ones hang); this path is opt-in
and intended for standard TPU runtimes. The plain-XLA scan already sustains
~1.7M denoise-steps/s/chip at the hopper operating point (bench.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _activation_fn(name: str):
    """Elementwise activation inside the kernel (VPU ops only)."""
    if name == "ReLU":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "Mish":
        return lambda v: v * jnp.tanh(jax.nn.softplus(v))
    raise ValueError(f"unsupported fused-kernel activation {name!r}")


class PackedMLP(NamedTuple):
    """Padded weight matrices of the flagship denoiser, plus layout info.

    Residual blocks are stacked on a leading axis so the kernel handles
    ANY trunk depth (mlp_dims of odd length 2n+1 -> n pre-activation
    residual blocks), not just the 3-layer flagship shape."""

    w0: jnp.ndarray  # (IN_P, W)  input dense (zero rows at padding)
    b0: jnp.ndarray  # (1, W)
    wl1: jnp.ndarray  # (n_blocks, W, W)   residual block dense 1
    bl1: jnp.ndarray  # (n_blocks, 1, W)
    wl2: jnp.ndarray  # (n_blocks, W, W)   residual block dense 2
    bl2: jnp.ndarray  # (n_blocks, 1, W)
    w3: jnp.ndarray  # (W, OUT_P) output dense (zero cols at padding)
    b3: jnp.ndarray  # (1, OUT_P)


def pack_diffusion_mlp(params, x_dim: int, time_dim: int, cond_dim: int):
    """Pack flax DiffusionMLP params into padded kernel matrices.

    Layout of the kernel input row (IN_P = round_up(x+t+s, 128)):
      [0:x_dim] action chunk | [x_dim:x_dim+time_dim] time emb |
      [.. + cond_dim] state | zeros
    """
    p = params["params"]
    mlp = p["ResidualMLP_0"]
    prefix = "TwoLayerPreActivationResNetLinear_"
    block_keys = sorted(
        (k for k in mlp if k.startswith(prefix)),
        key=lambda k: int(k[len(prefix):]),
    )
    expected = {"Dense_0", "Dense_1"} | set(block_keys)
    if not block_keys or set(mlp.keys()) != expected:
        raise ValueError(
            "fused chain kernel supports pre-activation residual trunks "
            "without layernorm (mlp_dims of odd length, equal widths); "
            f"got trunk submodules {sorted(mlp.keys())}"
        )
    w0_raw = mlp["Dense_0"]["kernel"]  # (in, W)
    b0 = mlp["Dense_0"]["bias"]
    blks = [mlp[k] for k in block_keys]
    wl1 = jnp.stack([b["Dense_0"]["kernel"] for b in blks])  # (n, W, W)
    bl1 = jnp.stack([b["Dense_0"]["bias"][None] for b in blks])  # (n, 1, W)
    wl2 = jnp.stack([b["Dense_1"]["kernel"] for b in blks])
    bl2 = jnp.stack([b["Dense_1"]["bias"][None] for b in blks])
    w3_raw = mlp["Dense_1"]["kernel"]  # (W, out)
    b3_raw = mlp["Dense_1"]["bias"]

    in_dim = x_dim + time_dim + cond_dim
    assert w0_raw.shape[0] == in_dim, (w0_raw.shape, in_dim)
    W = w0_raw.shape[1]
    out_dim = w3_raw.shape[1]
    IN_P = _round_up(in_dim, LANE)
    OUT_P = _round_up(out_dim, LANE)
    w0 = jnp.zeros((IN_P, W), jnp.float32).at[:in_dim].set(w0_raw)
    w3 = jnp.zeros((W, OUT_P), jnp.float32).at[:, :out_dim].set(w3_raw)
    b3 = jnp.zeros((1, OUT_P), jnp.float32).at[0, :out_dim].set(b3_raw)
    return PackedMLP(
        w0=w0,
        b0=b0[None],
        wl1=wl1,
        bl1=bl1,
        wl2=wl2,
        bl2=bl2,
        w3=w3,
        b3=b3,
    )


def precompute_time_embeddings(params, t_schedule, time_dim: int):
    """Run the (t-only) time-embedding MLP once per step outside the kernel."""
    from dppo_tpu.nets.modules import sinusoidal_pos_emb
    from dppo_tpu.nets.mlp import ACTIVATIONS

    p = params["params"]["TimeEmbedding_0"]
    emb = sinusoidal_pos_emb(t_schedule.astype(jnp.float32), time_dim)
    emb = emb @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    emb = ACTIVATIONS["Mish"](emb)
    return emb @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]  # (K, time_dim)


def _chain_kernel(
    # scalar-prefetch free; refs in order: inputs..., outputs..., scratch...
    coef_ref,  # (8, K) f32 SMEM: c1, c2, mu1, mu2, std, denoised_clip,
    #            final_clip_flag, final_clip_value
    x0_ref,  # (Bp, OUT_P) VMEM
    state_ref,  # (Bp, IN_P) VMEM — state already placed at its column offset
    temb_ref,  # (K, LANE) VMEM — per-step time embedding (padded to LANE)
    noise_ref,  # (K, Bp, OUT_P) VMEM
    w0_ref, b0_ref, wl1_ref, bl1_ref, wl2_ref, bl2_ref, w3_ref, b3_ref,
    chain_ref,  # (K + 1, Bp, OUT_P) VMEM out
    *,
    K: int,
    x_dim: int,
    time_dim: int,
    activation: str = "ReLU",
):
    x = x0_ref[:]  # (Bp, OUT_P); action lives in cols [0:x_dim]
    chain_ref[0] = x
    Bp = x.shape[0]
    act = _activation_fn(activation)

    def step(i, x):
        # assemble input row: state (preplaced) + x segment + time segment
        inp = state_ref[:]
        inp = jax.lax.dynamic_update_slice(inp, x[:, :x_dim], (0, 0))
        temb_row = temb_ref[i, :time_dim][None, :]
        inp = jax.lax.dynamic_update_slice(
            inp, jnp.broadcast_to(temb_row, (Bp, time_dim)), (0, x_dim)
        )

        h = (
            jnp.dot(inp, w0_ref[:], preferred_element_type=jnp.float32)
            + b0_ref[:]
        )
        # static (unrolled) loop over the stacked residual blocks:
        # r <- r + l2(act(l1(act(r)))) per block, any trunk depth
        r = h
        for j in range(wl1_ref.shape[0]):
            t1 = (
                jnp.dot(
                    act(r), wl1_ref[j],
                    preferred_element_type=jnp.float32,
                )
                + bl1_ref[j]
            )
            t2 = (
                jnp.dot(
                    act(t1), wl2_ref[j],
                    preferred_element_type=jnp.float32,
                )
                + bl2_ref[j]
            )
            r = t2 + r
        eps = (
            jnp.dot(r, w3_ref[:], preferred_element_type=jnp.float32)
            + b3_ref[:]
        )

        c1 = coef_ref[0, i]
        c2 = coef_ref[1, i]
        mu1 = coef_ref[2, i]
        mu2 = coef_ref[3, i]
        std = coef_ref[4, i]
        dclip = coef_ref[5, i]
        fclip_flag = coef_ref[6, i]
        fclip_val = coef_ref[7, i]

        x_recon = c1 * x - c2 * eps
        x_recon = jnp.clip(x_recon, -dclip, dclip)
        mean = mu1 * x_recon + mu2 * x
        new_x = mean + std * noise_ref[i]
        new_x = jnp.where(
            fclip_flag > 0.5,
            jnp.clip(new_x, -fclip_val, fclip_val),
            new_x,
        )
        chain_ref[i + 1] = new_x
        return new_x

    jax.lax.fori_loop(0, K, step, x)


def _chain_kernel_planes(
    coef_ref,  # (5, K) f32 SMEM: c1, c2, denoised_clip, final_clip_flag,
    #            final_clip_value
    x0_ref,  # (Bp, OUT_P) VMEM
    state_ref,  # (Bp, IN_P) VMEM — state already placed at its column offset
    temb_ref,  # (K, LANE) VMEM — per-step time embedding (padded to LANE)
    noise_ref,  # (K, Bp, OUT_P) VMEM — pre-scaled by the per-element std
    mu1_ref,  # (K, Bp, OUT_P) VMEM — per-element posterior coef on x_recon
    mu2_ref,  # (K, Bp, OUT_P) VMEM — per-element posterior coef on x
    w0_ref, b0_ref, wl1_ref, bl1_ref, wl2_ref, bl2_ref, w3_ref, b3_ref,
    chain_ref,  # (K + 1, Bp, OUT_P) VMEM out
    *,
    K: int,
    x_dim: int,
    time_dim: int,
    activation: str = "ReLU",
):
    """Per-element-coefficient variant of `_chain_kernel` for DDIM with a
    per-sample / per-action-dim η module (EtaAction/EtaState/EtaStateAction):
    σ — and through it mu1/mu2 — varies across the batch and action dims, so
    those coefficients arrive as (K, B, x_dim) planes instead of per-step
    scalars; std is folded into the pre-scaled noise input."""
    x = x0_ref[:]
    chain_ref[0] = x
    Bp = x.shape[0]
    act = _activation_fn(activation)

    def step(i, x):
        inp = state_ref[:]
        inp = jax.lax.dynamic_update_slice(inp, x[:, :x_dim], (0, 0))
        temb_row = temb_ref[i, :time_dim][None, :]
        inp = jax.lax.dynamic_update_slice(
            inp, jnp.broadcast_to(temb_row, (Bp, time_dim)), (0, x_dim)
        )

        h = (
            jnp.dot(inp, w0_ref[:], preferred_element_type=jnp.float32)
            + b0_ref[:]
        )
        # static (unrolled) loop over the stacked residual blocks:
        # r <- r + l2(act(l1(act(r)))) per block, any trunk depth
        r = h
        for j in range(wl1_ref.shape[0]):
            t1 = (
                jnp.dot(
                    act(r), wl1_ref[j],
                    preferred_element_type=jnp.float32,
                )
                + bl1_ref[j]
            )
            t2 = (
                jnp.dot(
                    act(t1), wl2_ref[j],
                    preferred_element_type=jnp.float32,
                )
                + bl2_ref[j]
            )
            r = t2 + r
        eps = (
            jnp.dot(r, w3_ref[:], preferred_element_type=jnp.float32)
            + b3_ref[:]
        )

        c1 = coef_ref[0, i]
        c2 = coef_ref[1, i]
        dclip = coef_ref[2, i]
        fclip_flag = coef_ref[3, i]
        fclip_val = coef_ref[4, i]

        x_recon = c1 * x - c2 * eps
        x_recon = jnp.clip(x_recon, -dclip, dclip)
        new_x = mu1_ref[i] * x_recon + mu2_ref[i] * x + noise_ref[i]
        new_x = jnp.where(
            fclip_flag > 0.5,
            jnp.clip(new_x, -fclip_val, fclip_val),
            new_x,
        )
        chain_ref[i + 1] = new_x
        return new_x

    jax.lax.fori_loop(0, K, step, x)


def fused_chain_planes(
    packed: PackedMLP,
    coefs: jnp.ndarray,  # (5, K): c1, c2, dclip, fflag, fval
    mu1: jnp.ndarray,  # (K, B, x_dim)
    mu2: jnp.ndarray,  # (K, B, x_dim)
    x0: jnp.ndarray,  # (B, x_dim)
    state_row: jnp.ndarray,  # (B, IN_P) with state placed at offset
    temb: jnp.ndarray,  # (K, time_dim)
    noise_scaled: jnp.ndarray,  # (K, B, x_dim) — already multiplied by std
    *,
    x_dim: int,
    time_dim: int,
    activation: str = "ReLU",
):
    """Returns the chain (K+1, B, x_dim) for the per-element-coef DDIM path."""
    K = coefs.shape[1]
    B = x0.shape[0]
    Bp = _round_up(B, 8)
    IN_P = state_row.shape[1]
    OUT_P = packed.w3.shape[1]
    W = packed.w0.shape[1]
    NBLK = packed.wl1.shape[0]
    LANE_T = _round_up(time_dim, LANE)

    x0_p = jnp.zeros((Bp, OUT_P), jnp.float32).at[:B, :x_dim].set(x0)
    state_p = jnp.zeros((Bp, IN_P), jnp.float32).at[:B].set(state_row)
    temb_p = jnp.zeros((K, LANE_T), jnp.float32).at[:, :time_dim].set(temb)

    def _pad_plane(p):
        return (
            jnp.zeros((K, Bp, OUT_P), jnp.float32).at[:, :B, :x_dim].set(p)
        )

    kernel = functools.partial(
        _chain_kernel_planes, K=K, x_dim=x_dim, time_dim=time_dim,
        activation=activation,
    )
    chain = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K + 1, Bp, OUT_P), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # state
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # noise (pre-scaled)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu1 plane
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu2 plane
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bl1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bl2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Bp * (IN_P * W + NBLK * 2 * W * W + W * OUT_P),
            bytes_accessed=(3 * K + 1) * Bp * OUT_P * 4
            + 4 * (IN_P * W + NBLK * 2 * W * W + W * OUT_P),
            transcendentals=0,
        ),
    )(
        coefs,
        x0_p,
        state_p,
        temb_p,
        _pad_plane(noise_scaled),
        _pad_plane(mu1),
        _pad_plane(mu2),
        packed.w0,
        packed.b0,
        packed.wl1,
        packed.bl1,
        packed.wl2,
        packed.bl2,
        packed.w3,
        packed.b3,
    )
    return chain[:, :B, :x_dim]


def fused_ddpm_chain(
    packed: PackedMLP,
    coefs: jnp.ndarray,  # (8, K)
    x0: jnp.ndarray,  # (B, x_dim)
    state_row: jnp.ndarray,  # (B, IN_P) with state placed at offset
    temb: jnp.ndarray,  # (K, time_dim)
    noise: jnp.ndarray,  # (K, B, x_dim)
    *,
    x_dim: int,
    time_dim: int,
    activation: str = "ReLU",
):
    """Returns the chain (K+1, B, x_dim) of denoising states."""
    K = coefs.shape[1]
    B = x0.shape[0]
    Bp = _round_up(B, 8)
    IN_P = state_row.shape[1]
    OUT_P = packed.w3.shape[1]
    W = packed.w0.shape[1]
    NBLK = packed.wl1.shape[0]
    LANE_T = _round_up(time_dim, LANE)

    x0_p = jnp.zeros((Bp, OUT_P), jnp.float32).at[:B, :x_dim].set(x0)
    state_p = jnp.zeros((Bp, IN_P), jnp.float32).at[:B].set(state_row)
    temb_p = jnp.zeros((K, LANE_T), jnp.float32).at[:, :time_dim].set(temb)
    noise_p = (
        jnp.zeros((K, Bp, OUT_P), jnp.float32).at[:, :B, :x_dim].set(noise)
    )

    kernel = functools.partial(
        _chain_kernel, K=K, x_dim=x_dim, time_dim=time_dim,
        activation=activation,
    )
    chain = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K + 1, Bp, OUT_P), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # state
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # noise
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bl1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bl2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Bp * (IN_P * W + NBLK * 2 * W * W + W * OUT_P),
            bytes_accessed=(K + 1) * Bp * OUT_P * 4
            + 4 * (IN_P * W + NBLK * 2 * W * W + W * OUT_P),
            transcendentals=0,
        ),
    )(
        coefs,
        x0_p,
        state_p,
        temb_p,
        noise_p,
        packed.w0,
        packed.b0,
        packed.wl1,
        packed.bl1,
        packed.wl2,
        packed.bl2,
        packed.w3,
        packed.b3,
    )
    return chain[:, :B, :x_dim]


class FusedChainSampler:
    """Wires the fused kernel to a VPGDiffusion-style model.

    Usage (opt-in fast path; residual-MLP denoiser; DDPM, or DDIM with any
    η module — global scalar, per-action-dim, or state-conditioned,
    learnable included — and no eps clip):
        sampler = FusedChainSampler(model)
        sample = sampler(params, cond, rng, deterministic=False)

    Matches `VPGDiffusion.sample` semantics: per-step base/ft actor
    selection, std floors (min_sampling_denoising_std, eval 1e-3/0 rules,
    DDIM σ_η), randn clipping, denoised clip (with DDIM ε-recompute folded
    into the posterior coefficients), final action clip, chain recording of
    the last K_ft + 1 states. Per-sample η modules route to the
    plane-coefficient kernel (`fused_chain_planes`): η(cond) is evaluated
    once per query outside the kernel, expanded to (K, B, x_dim) mu1/mu2/std
    planes, and std is folded into the noise input.
    """

    def __init__(self, model):
        assert getattr(model, "sample_network_dtype", None) is None, (
            "fused chain kernel computes in fp32; disable "
            "sample_network_dtype=bfloat16 or the fused sampler"
        )
        self.per_sample_eta = False
        if model.use_ddim:
            # the DDIM update with ε-recompute-after-clip is algebraically
            # mu1·x_recon + mu2·x — the same kernel body as DDPM — as long as
            # ε itself isn't clipped. For a global η (none, or a learned
            # EtaFixed scalar) σ reduces to a per-step scalar; per-sample /
            # per-action-dim η modules (EtaAction/EtaState/EtaStateAction)
            # take the plane-coefficient kernel where mu1/mu2/std are
            # (K, B, x_dim) planes precomputed from η(cond) outside.
            assert model.eps_clip_value is None, (
                "fused DDIM path does not support eps_clip_value"
            )
            em = model.eta_module
            self.per_sample_eta = (
                em is not None and type(em).__name__ != "EtaFixed"
            )
        self.model = model
        net = model.network
        # the kernel bakes in the flagship denoiser shape — validate rather
        # than silently computing the wrong function for other architectures
        assert type(net).__name__ == "DiffusionMLP", (
            f"fused chain kernel requires DiffusionMLP, got {type(net).__name__}"
        )
        assert net.residual_style and not net.use_layernorm, (
            "fused chain kernel requires residual_style=True, use_layernorm=False"
        )
        dims = list(net.mlp_dims)
        assert len(dims) >= 3 and len(dims) % 2 == 1 and len(set(dims)) == 1, (
            f"fused chain kernel supports residual trunks of equal widths "
            f"(mlp_dims of odd length, like [W]*3 or [W]*5); got {dims}"
        )
        _activation_fn(net.activation_type)  # raises on unsupported
        assert net.out_activation_type == "Identity", (
            "fused chain kernel requires Identity output activation"
        )
        self.activation = net.activation_type
        self.x_dim = model.horizon_steps * model.action_dim
        self.time_dim = net.time_dim
        # with a cond MLP the trunk consumes the embedded state, which is
        # static per query and precomputed outside the kernel (per actor —
        # base and ft own separate cond-MLP weights)
        self.cond_mlp_dims = (
            list(net.cond_mlp_dims) if net.cond_mlp_dims else None
        )
        self.cond_dim = (
            self.cond_mlp_dims[-1] if self.cond_mlp_dims else net.cond_dim
        )
        self.in_dim = self.x_dim + self.time_dim + self.cond_dim
        self.IN_P = _round_up(self.in_dim, LANE)

    def _coefs_ddim(self, params, cond, deterministic: bool):
        """DDIM coefficient table (8, K) — jnp, since η may be a learned
        parameter. Mirrors `VPGDiffusion.p_mean_var_ft`'s DDIM branch
        (diffusion_vpg.py:198-213 semantics): with the ε-recompute after the
        denoised clip, the update is
            x' = [√ᾱ_prev − dir·√ᾱ/√(1−ᾱ)]·x_recon + [dir/√(1−ᾱ)]·x + σ·n
        with dir = √max(1−ᾱ_prev−σ², 1e-12), σ = max(η·σ_ddim, 1e-10)."""
        m = self.model
        K = m.ddim_steps
        al = m.ddim.alphas
        al_prev = m.ddim.alphas_prev
        som = m.ddim.sqrt_one_minus_alphas
        c1 = 1.0 / jnp.sqrt(al)
        c2 = som / jnp.sqrt(al)
        if deterministic or m.eta_module is None or params.eta is None:
            eta = jnp.zeros(())
        else:
            eta = m.eta_module.apply(params.eta, cond)[0, 0]
        sigma = jnp.maximum(
            eta * jnp.sqrt((1 - al_prev) / (1 - al) * (1 - al / al_prev)),
            1e-10,
        )
        dir_coef = jnp.sqrt(jnp.maximum(1.0 - al_prev - sigma**2, 1e-12))
        mu1 = jnp.sqrt(al_prev) - dir_coef * jnp.sqrt(al) / som
        mu2 = dir_coef / som
        if deterministic:
            std = jnp.zeros_like(sigma)
        else:
            std = jnp.clip(sigma, m.get_min_sampling_denoising_std(), None)
        dclip = jnp.full(
            (K,),
            m.denoised_clip_value if m.denoised_clip_value is not None else 1e9,
        )
        fflag = jnp.zeros((K,))
        fval = jnp.ones((K,))
        if m.final_action_clip_value is not None:
            fflag = fflag.at[-1].set(1.0)
            fval = fval.at[-1].set(m.final_action_clip_value)
        return jnp.stack([c1, c2, mu1, mu2, std, dclip, fflag, fval]).astype(
            jnp.float32
        )

    def _planes_ddim(self, params, cond, deterministic: bool):
        """DDIM with per-sample η: 5-row scalar coef table + (K, B, x_dim)
        mu1/mu2/std planes. Same math as `_coefs_ddim` with η(cond) varying
        over (batch, action-dim); the η→flat-dim layout matches the scan
        sampler's broadcast (eta_value[:, None] over (B, Ta, Da))."""
        m = self.model
        K = m.ddim_steps
        al = m.ddim.alphas
        al_prev = m.ddim.alphas_prev
        som = m.ddim.sqrt_one_minus_alphas
        eta_value = m._eta_value(params, cond, deterministic)  # (B,1)/(B,Da)
        B = eta_value.shape[0]
        if eta_value.shape[1] == 1:
            eta_flat = jnp.broadcast_to(eta_value, (B, self.x_dim))
        else:
            # flat dim d = ta*Da + da → η per flat dim repeats over Ta
            eta_flat = jnp.tile(eta_value, (1, m.horizon_steps))
        s = jnp.sqrt((1 - al_prev) / (1 - al) * (1 - al / al_prev))  # (K,)
        sigma = jnp.maximum(eta_flat[None] * s[:, None, None], 1e-10)
        dir_coef = jnp.sqrt(
            jnp.maximum(1.0 - al_prev[:, None, None] - sigma**2, 1e-12)
        )
        mu1 = (
            jnp.sqrt(al_prev)[:, None, None]
            - dir_coef * (jnp.sqrt(al) / som)[:, None, None]
        )
        mu2 = dir_coef / som[:, None, None]
        if deterministic:
            std = jnp.zeros_like(sigma)
        else:
            std = jnp.clip(sigma, m.get_min_sampling_denoising_std(), None)
        c1 = 1.0 / np.sqrt(np.asarray(al))
        c2 = np.asarray(som) / np.sqrt(np.asarray(al))
        dclip = np.full(
            K,
            m.denoised_clip_value if m.denoised_clip_value is not None else 1e9,
        )
        fflag = np.zeros(K)
        fval = np.ones(K)
        if m.final_action_clip_value is not None:
            fflag[-1] = 1.0
            fval[-1] = m.final_action_clip_value
        coefs = jnp.asarray(
            np.stack([c1, c2, dclip, fflag, fval]).astype(np.float32)
        )
        return coefs, mu1.astype(jnp.float32), mu2.astype(jnp.float32), std

    def _coefs(self, deterministic: bool) -> np.ndarray:
        m = self.model
        K = m.denoising_steps
        t_sched = np.arange(K - 1, -1, -1)  # DDPM sampling order
        c1 = np.asarray(m.ddpm.sqrt_recip_alphas_cumprod)[t_sched]
        c2 = np.asarray(m.ddpm.sqrt_recipm1_alphas_cumprod)[t_sched]
        mu1 = np.asarray(m.ddpm.ddpm_mu_coef1)[t_sched]
        mu2 = np.asarray(m.ddpm.ddpm_mu_coef2)[t_sched]
        std = np.exp(0.5 * np.asarray(m.ddpm.ddpm_logvar_clipped)[t_sched])
        if deterministic:
            std = np.clip(std, 1e-3, None)
            std[t_sched == 0] = 0.0
        else:
            std = np.clip(std, m.get_min_sampling_denoising_std(), None)
        dclip = np.full(K, m.denoised_clip_value if m.denoised_clip_value
                        is not None else 1e9)
        fflag = np.zeros(K)
        fval = np.ones(K)
        if m.final_action_clip_value is not None:
            fflag[-1] = 1.0
            fval[-1] = m.final_action_clip_value
        return np.stack([c1, c2, mu1, mu2, std, dclip, fflag, fval]).astype(
            np.float32
        )

    def __call__(
        self, params, cond, rng, deterministic: bool = False,
        use_base_policy: bool = False,
    ):
        from dppo_tpu.diffusion.core import Sample

        m = self.model
        K, K_ft = m.n_sampling_steps, m.ft_denoising_steps
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)

        def _state_row(actor_params):
            s = state
            if self.cond_mlp_dims:
                from dppo_tpu.nets.mlp import MLP

                s = MLP(
                    [m.network.cond_dim] + self.cond_mlp_dims,
                    activation_type=m.network.activation_type,
                    out_activation_type="Identity",
                ).apply({"params": actor_params["params"]["MLP_0"]}, state)
            return jnp.zeros((B, self.IN_P)).at[
                :, self.x_dim + self.time_dim : self.in_dim
            ].set(s)

        rng_x, rng_n = jax.random.split(rng)
        x0 = jax.random.normal(rng_x, (B, self.x_dim))
        noise = jnp.clip(
            jax.random.normal(rng_n, (K, B, self.x_dim)),
            -m.randn_clip_value,
            m.randn_clip_value,
        )
        planes = None
        if m.use_ddim and self.per_sample_eta:
            coefs, mu1, mu2, std = self._planes_ddim(
                params, cond, deterministic
            )
            planes = (mu1, mu2, std * noise)
        elif m.use_ddim:
            coefs = self._coefs_ddim(params, cond, deterministic)
        else:
            coefs = jnp.asarray(self._coefs(deterministic))
        t_sched = m.t_schedule()
        base_steps = K - K_ft

        sample_actor = params.actor if use_base_policy else params.actor_ft
        packed_base = pack_diffusion_mlp(
            params.actor, self.x_dim, self.time_dim, self.cond_dim
        )
        packed_ft = pack_diffusion_mlp(
            sample_actor, self.x_dim, self.time_dim, self.cond_dim
        )
        temb_base = precompute_time_embeddings(
            params.actor, t_sched, self.time_dim
        )
        temb_ft = precompute_time_embeddings(
            sample_actor, t_sched, self.time_dim
        )
        row_base = _state_row(params.actor)
        row_ft = _state_row(sample_actor)

        def launch(packed, temb, state_row, x_start, lo, hi):
            if planes is None:
                return fused_ddpm_chain(
                    packed, coefs[:, lo:hi], x_start, state_row,
                    temb[lo:hi], noise[lo:hi],
                    x_dim=self.x_dim, time_dim=self.time_dim,
                    activation=self.activation,
                )
            mu1, mu2, noise_scaled = planes
            return fused_chain_planes(
                packed, coefs[:, lo:hi], mu1[lo:hi], mu2[lo:hi],
                x_start, state_row, temb[lo:hi], noise_scaled[lo:hi],
                x_dim=self.x_dim, time_dim=self.time_dim,
                activation=self.activation,
            )

        if base_steps == 0:
            chain = launch(packed_ft, temb_ft, row_ft, x0, 0, K)
        elif base_steps == K:
            chain = launch(packed_base, temb_base, row_base, x0, 0, K)
        else:
            # two kernel launches: base prefix, then ft suffix from handoff
            chain_a = launch(packed_base, temb_base, row_base, x0, 0, base_steps)
            chain_b = launch(
                packed_ft, temb_ft, row_ft, chain_a[-1], base_steps, K
            )
            chain = jnp.concatenate([chain_a, chain_b[1:]], axis=0)

        Ta, Da = m.horizon_steps, m.action_dim
        chain_actions = chain.reshape(K + 1, B, Ta, Da)
        traj = chain_actions[-1]
        recorded = jnp.swapaxes(chain_actions[K - K_ft :], 0, 1)
        return Sample(traj, recorded)


def normalize_fused_mode(value) -> str:
    """Normalize a `train.fused_sampler` config value to off/auto/on.

    YAML parses bare `on`/`off` as booleans, so accept those (and their
    string forms) rather than silently treating them as unknown modes."""
    if isinstance(value, bool):
        return "on" if value else "off"
    mode = {"true": "on", "false": "off"}.get(str(value).lower(), str(value).lower())
    if mode not in ("off", "auto", "on"):
        raise ValueError(f"fused_sampler must be off/auto/on, got {value!r}")
    return mode


def auto_fused_sampler(model, example_params, example_cond, mode="auto"):
    """Build a jitted fused-chain sampler matching `VPGDiffusion.sample`
    (signature (params, cond, rng, det) with `det` static), or return None.

    mode:
      - "off":  always None.
      - "auto": only on a real TPU backend (`jax.default_backend() == "tpu"`)
        — the axon tunnel backend hangs compiling Mosaic kernels and CPU has
        no Pallas TPU lowering — and only if the model qualifies
        (single-residual-block DiffusionMLP; DDPM, or DDIM with no eps clip;
        any η module) and a probe compile + run succeeds. Any failure falls
        back to None.
      - "on":   attempt unconditionally and raise on failure.
    """
    mode = normalize_fused_mode(mode)
    if mode == "off":
        return None
    import os as _os

    import jax as _jax

    if mode == "auto":
        # the axon tunnel reports default_backend() == "tpu" but hangs on
        # Mosaic compiles; it is only identifiable from the platform spec
        spec = str(
            getattr(_jax.config, "jax_platforms", None)
            or _os.environ.get("JAX_PLATFORMS", "")
        ).lower()
        if "axon" in spec or _jax.default_backend() != "tpu":
            return None
    try:
        net_kind = type(model.network).__name__
        if net_kind in ("Unet1D", "VisionUnet1D"):
            from dppo_tpu.ops.pallas.fused_chain_unet import (
                FusedUnetChainSampler,
            )

            sampler = FusedUnetChainSampler(model)
        else:
            sampler = FusedChainSampler(model)  # asserts model qualifies
        fn = _jax.jit(
            lambda p, c, r, det: sampler(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        out = fn(example_params, example_cond, _jax.random.key(0), False)
        _jax.block_until_ready(out.trajectories)
        return fn
    except Exception:
        if mode == "on":
            raise
        return None
