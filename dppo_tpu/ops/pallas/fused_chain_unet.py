"""Pallas TPU kernel: the whole K-step denoising chain for Unet1D trunks.

Companion to `fused_chain.py` (which covers residual-MLP trunks): pins the
Conv1d U-Net weights in VMEM and runs the full reverse process in one
kernel, so the K-step chain never round-trips weights or activations
through HBM. Covers the reference's heaviest shipped compute path — the
robomimic/furniture U-Net recipes (`unet.py:121`, VisionUnet1D `unet.py:330`
via the cond-hoist: the ViT feature is encoded once outside and enters the
U-Net as part of the condition).

Everything that depends only on (t, cond) is precomputed OUTSIDE the
kernel, per actor tree:
  * the time MLP (function of the static schedule) and optional cond MLP;
  * every residual block's FiLM embedding e = MLP(global_feature) — a
    function of (t, cond) only, materialized as (K, B, ch) scale/bias
    planes (`precompute_unet_film`);
  * the posterior coefficient tables (shared with FusedChainSampler).

Inside the kernel, per denoise step: Conv1d as K_tap shifted matmuls over
the (tiny, static) action-chunk time axis, optional GroupNorm via a
group-mask matmul (padding-safe masked mean/var), Mish/ReLU on the VPU,
FiLM scale/bias injection, down/up-sampling convs with statically derived
tap alignment, skip concatenation in the padded channel layout, and the
DDPM/DDIM posterior update — identical math to `VPGDiffusion.sample`
(noise is an input, so fused and scan samplers agree on the same draws).

VMEM budget at the largest shipped shape (dim 64, dim_mults (1,2,4),
Ta=16, kernel 5): conv weights ~6 MB fp32 + FiLM planes (K<=20, B, <=512)
+ activations (B_chunk, 16, 512p) x ~6 live buffers — fits the v5e's
128 MB VMEM with batch chunking; the per-chunk batch is the grid axis.

Validated bit-close (<=1e-5) against the flax Unet1D/VisionUnet1D scan
sampler in interpreter mode (`tests/test_fused_chain_unet.py`). Like the
MLP kernel, this path is auto-gated off runtimes that cannot compile
Mosaic (the axon tunnel).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.ops.pallas.fused_chain import (
    LANE,
    FusedChainSampler,
    _activation_fn,
    _round_up,
)

SUBLANE = 8


class ConvSpec(NamedTuple):
    name: str  # param-tree path, "/"-joined
    cin: int
    cout: int
    ktaps: int
    # list of (out_t, [(in_t, tap_k), ...]) static tap alignment
    taps: tuple
    t_in: int
    t_out: int


class BlockSpec(NamedTuple):
    name: str
    cin: int
    cout: int
    has_residual_conv: bool
    t: int


class UnetSpec(NamedTuple):
    action_dim: int
    horizon: int
    dims: tuple  # channel dims per stage incl. input
    mults: tuple
    n_groups: Optional[int]
    gn_eps: float
    cond_predict_scale: bool
    activation: str
    kernel_size: int
    # static plan: ordered ops
    down_blocks: tuple  # per stage: (BlockSpec res1, BlockSpec res2)
    down_samples: tuple  # ConvSpec or None per stage
    mid_blocks: tuple
    up_blocks: tuple  # per up stage: (skip_channels, res1, res2)
    up_samples: tuple
    final_cin: int
    t_stages: tuple  # T at each down stage


def _conv_taps(t_in: int, t_out: int, k: int, stride: int, pad_l: int):
    """Static tap table: out[t'] = sum_k x[t'*stride + k - pad_l] W[k]."""
    taps = []
    for to in range(t_out):
        row = []
        for kk in range(k):
            ti = to * stride + kk - pad_l
            if 0 <= ti < t_in:
                row.append((ti, kk))
        taps.append((to, tuple(row)))
    return tuple(taps)


def _convT_taps(t_in: int, t_out: int, k: int, stride: int, pad_l: int):
    """Transposed conv as correlation over the zero-dilated input:
    out[t'] = sum_k xd[t' + k - pad_l] W[k], xd[2i] = x[i] (dilation 2)."""
    taps = []
    for to in range(t_out):
        row = []
        for kk in range(k):
            td = to + kk - pad_l
            if td >= 0 and td % stride == 0 and td // stride < t_in:
                row.append((td // stride, kk))
        taps.append((to, tuple(row)))
    return tuple(taps)


def build_unet_spec(net, horizon: int) -> UnetSpec:
    """Static layout plan for a Unet1D module (validates support)."""
    mults = tuple(net.dim_mults)
    dims = (net.action_dim,) + tuple(net.dim * m for m in mults)
    k = int(net.kernel_size)
    t = horizon
    t_stages = []
    down_blocks, down_samples = [], []
    in_out = list(zip(dims[:-1], dims[1:]))
    for ind, (cin, cout) in enumerate(in_out):
        t_stages.append(t)
        down_blocks.append((
            BlockSpec(f"down{ind}_res1", cin, cout, cin != cout, t),
            BlockSpec(f"down{ind}_res2", cout, cout, False, t),
        ))
        if ind < len(in_out) - 1:
            t_next = (t + 2 - 3) // 2 + 1  # conv k3 s2 p1
            down_samples.append(ConvSpec(
                f"down{ind}_ds", cout, cout, 3,
                _conv_taps(t, t_next, 3, 2, 1), t, t_next,
            ))
            t = t_next
        else:
            down_samples.append(None)
    mid = (
        BlockSpec("mid_res1", dims[-1], dims[-1], False, t),
        BlockSpec("mid_res2", dims[-1], dims[-1], False, t),
    )
    up_blocks, up_samples = [], []
    for ind, (cin, cout) in enumerate(reversed(in_out[1:])):
        skip_c = cout
        cat_c = cout + skip_c
        up_blocks.append((
            skip_c,
            BlockSpec(f"up{ind}_res1", cat_c, cin, True, t),
            BlockSpec(f"up{ind}_res2", cin, cin, False, t),
        ))
        if ind < len(in_out) - 1:
            t_next = t * 2  # ConvTranspose k4 s2 SAME (pad_l=2, empirically
            # pinned against flax.nn.ConvTranspose in the kernel tests)
            up_samples.append(ConvSpec(
                f"up{ind}_us", cin, cin, 4,
                _convT_taps(t, t_next, 4, 2, 2), t, t_next,
            ))
            t = t_next
        else:
            up_samples.append(None)
    assert t == horizon, (t, horizon)
    return UnetSpec(
        action_dim=net.action_dim,
        horizon=horizon,
        dims=dims,
        mults=mults,
        n_groups=net.n_groups,
        gn_eps=float(net.groupnorm_eps),
        cond_predict_scale=bool(net.cond_predict_scale),
        activation=net.activation_type,
        kernel_size=k,
        down_blocks=tuple(down_blocks),
        down_samples=tuple(down_samples),
        mid_blocks=mid,
        up_blocks=tuple(up_blocks),
        up_samples=tuple(up_samples),
        final_cin=dims[1],
        t_stages=tuple(t_stages),
    )


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _pad_conv(kern, bias, cin_p, cout_p):
    k, cin, cout = kern.shape
    w = jnp.zeros((k, cin_p, cout_p), jnp.float32)
    w = w.at[:, :cin, :cout].set(kern)
    b = jnp.zeros((1, cout_p), jnp.float32).at[0, :cout].set(bias)
    return w, b


def _cp(c):
    return _round_up(max(c, 1), LANE)


def pack_unet1d(params, spec: UnetSpec):
    """Pack the trunk conv weights into padded arrays keyed by path."""
    p = params["params"]
    packed = {}

    def pack_block(bs: BlockSpec):
        b = _get(p, bs.name)
        for i, cin in ((0, bs.cin), (1, bs.cout)):
            cb = b[f"Conv1dBlock_{i}"]
            w, bb = _pad_conv(
                cb["Conv_0"]["kernel"], cb["Conv_0"]["bias"],
                _cp(cin), _cp(bs.cout),
            )
            packed[f"{bs.name}/c{i}_w"] = w
            packed[f"{bs.name}/c{i}_b"] = bb
            if spec.n_groups is not None:
                gn = cb["GroupNorm_0"]
                packed[f"{bs.name}/c{i}_gns"] = (
                    jnp.zeros((1, _cp(bs.cout)), jnp.float32)
                    .at[0, :bs.cout].set(gn["scale"])
                )
                packed[f"{bs.name}/c{i}_gnb"] = (
                    jnp.zeros((1, _cp(bs.cout)), jnp.float32)
                    .at[0, :bs.cout].set(gn["bias"])
                )
        if bs.has_residual_conv:
            w, bb = _pad_conv(
                b["Conv_0"]["kernel"], b["Conv_0"]["bias"],
                _cp(bs.cin), _cp(bs.cout),
            )
            packed[f"{bs.name}/res_w"] = w[0]
            packed[f"{bs.name}/res_b"] = bb

    for res1, res2 in spec.down_blocks:
        pack_block(res1)
        pack_block(res2)
    for ds in spec.down_samples:
        if ds is not None:
            c = _get(p, ds.name)
            w, b = _pad_conv(c["kernel"], c["bias"], _cp(ds.cin), _cp(ds.cout))
            packed[f"{ds.name}/w"] = w
            packed[f"{ds.name}/b"] = b
    for bs in spec.mid_blocks:
        pack_block(bs)
    for _, res1, res2 in spec.up_blocks:
        pack_block(res1)
        pack_block(res2)
    for us in spec.up_samples:
        if us is not None:
            c = _get(p, us.name)
            w, b = _pad_conv(c["kernel"], c["bias"], _cp(us.cin), _cp(us.cout))
            packed[f"{us.name}/w"] = w
            packed[f"{us.name}/b"] = b
    # final Conv1dBlock + 1x1 head
    cb = p["Conv1dBlock_0"]
    w, b = _pad_conv(
        cb["Conv_0"]["kernel"], cb["Conv_0"]["bias"],
        _cp(spec.final_cin), _cp(spec.final_cin),
    )
    packed["final_block/w"] = w
    packed["final_block/b"] = b
    if spec.n_groups is not None:
        gn = cb["GroupNorm_0"]
        packed["final_block/gns"] = (
            jnp.zeros((1, _cp(spec.final_cin)), jnp.float32)
            .at[0, :spec.final_cin].set(gn["scale"])
        )
        packed["final_block/gnb"] = (
            jnp.zeros((1, _cp(spec.final_cin)), jnp.float32)
            .at[0, :spec.final_cin].set(gn["bias"])
        )
    w, b = _pad_conv(
        p["final_conv"]["kernel"], p["final_conv"]["bias"],
        _cp(spec.final_cin), _cp(spec.action_dim),
    )
    packed["final_conv/w"] = w[0]
    packed["final_conv/b"] = b

    # GroupNorm group-mask matrices per channel count (Cp, LANE): one-hot
    # group assignment for the real channels (padding-safe masked stats)
    if spec.n_groups is not None:
        for c in sorted({bs.cout for blks in spec.down_blocks for bs in blks}
                        | {bs.cout for bs in spec.mid_blocks}
                        | {bs.cout for _, *blks in spec.up_blocks for bs in blks}
                        | {spec.final_cin}):
            g = spec.n_groups
            m = np.zeros((_cp(c), LANE), np.float32)
            per = c // g
            for ch in range(c):
                m[ch, ch // per] = 1.0
            packed[f"gn_mask/{c}"] = jnp.asarray(m)
    return packed


def precompute_unet_film(params, spec: UnetSpec, t_sched, state_flat,
                         cond_mlp_dims, cond_dim, dsed: int):
    """(t, cond)-only precomputation: the time MLP, optional cond MLP, and
    every residual block's FiLM embedding, expanded to (K, B, ch) planes
    (split into scale/bias when cond_predict_scale)."""
    from dppo_tpu.nets.modules import sinusoidal_pos_emb
    from dppo_tpu.nets.mlp import ACTIVATIONS

    p = params["params"]
    act = ACTIVATIONS["Mish"]
    emb = sinusoidal_pos_emb(t_sched.astype(jnp.float32), dsed)
    emb = emb @ p["time_mlp_1"]["kernel"] + p["time_mlp_1"]["bias"]
    emb = act(emb)
    emb = emb @ p["time_mlp_2"]["kernel"] + p["time_mlp_2"]["bias"]  # (K, dsed)

    state = state_flat
    if cond_mlp_dims is not None:
        from dppo_tpu.nets.mlp import ResidualMLP

        state = ResidualMLP(
            [cond_dim] + list(cond_mlp_dims),
            activation_type=spec.activation,
            out_activation_type="Identity",
        ).apply({"params": p["cond_mlp"]}, state_flat)
    K = emb.shape[0]
    B = state.shape[0]
    gf = jnp.concatenate(
        [jnp.broadcast_to(emb[:, None], (K, B, emb.shape[-1])),
         jnp.broadcast_to(state[None], (K, B, state.shape[-1]))],
        axis=-1,
    )  # (K, B, G)

    block_act = _activation_fn(spec.activation)
    films = {}

    def film(bs: BlockSpec):
        b = _get(p, bs.name)
        dense_keys = sorted(k for k in b if k.startswith("Dense_"))
        e = gf
        if len(dense_keys) == 3:  # larger_encoder
            e = e @ b["Dense_0"]["kernel"] + b["Dense_0"]["bias"]
            e = block_act(e)
            e = e @ b["Dense_1"]["kernel"] + b["Dense_1"]["bias"]
            e = block_act(e)
            e = e @ b["Dense_2"]["kernel"] + b["Dense_2"]["bias"]
        else:
            e = block_act(e) @ b["Dense_0"]["kernel"] + b["Dense_0"]["bias"]
        cp = _cp(bs.cout)
        if spec.cond_predict_scale:
            scale, bias = jnp.split(e, 2, axis=-1)
            films[f"{bs.name}/scale"] = (
                jnp.zeros((K, B, cp), jnp.float32).at[..., :bs.cout].set(scale)
            )
            films[f"{bs.name}/bias"] = (
                jnp.zeros((K, B, cp), jnp.float32).at[..., :bs.cout].set(bias)
            )
        else:
            films[f"{bs.name}/bias"] = (
                jnp.zeros((K, B, cp), jnp.float32).at[..., :bs.cout].set(e)
            )

    for res1, res2 in spec.down_blocks:
        film(res1)
        film(res2)
    for bs in spec.mid_blocks:
        film(bs)
    for _, res1, res2 in spec.up_blocks:
        film(res1)
        film(res2)
    return films


# ---------------------------------------------------------------------------
# kernel-safe forward (plain jnp ops on padded values; used both by the
# interpreter-path tests and inside the pallas kernel body)
# ---------------------------------------------------------------------------

def _conv_t(x_stack, w, b, taps):
    """x_stack: list of T_in (B, Cin_p) rows -> list of T_out (B, Cout_p)."""
    out = []
    for to, row in taps:
        acc = jnp.broadcast_to(b, (x_stack[0].shape[0], b.shape[-1]))
        for ti, kk in row:
            acc = acc + jnp.dot(
                x_stack[ti], w[kk], preferred_element_type=jnp.float32
            )
        out.append(acc)
    return out


def _groupnorm(xs, mask, scale, bias, c_real, n_groups, eps):
    """Masked GroupNorm over (channels-in-group x T) for a list of T rows."""
    T = len(xs)
    per = c_real // n_groups
    count = float(per * T)
    s = xs[0] @ mask
    for xt in xs[1:]:
        s = s + xt @ mask
    mean_g = s / count  # (B, LANE); only first n_groups cols meaningful
    v = (xs[0] * xs[0]) @ mask
    for xt in xs[1:]:
        v = v + (xt * xt) @ mask
    var_g = v / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ mask.T  # broadcast back per channel (padding -> 0)
    inv_c = inv_g @ mask.T
    return [((xt - mean_c) * inv_c) * scale + bias for xt in xs]


def _conv_block(xs, packed, name, idx, spec, cin, cout, taps):
    w = packed[f"{name}/c{idx}_w"]
    b = packed[f"{name}/c{idx}_b"]
    out = _conv_t(xs, w, b, taps)
    if spec.n_groups is not None:
        out = _groupnorm(
            out, packed[f"gn_mask/{cout}"],
            packed[f"{name}/c{idx}_gns"], packed[f"{name}/c{idx}_gnb"],
            cout, spec.n_groups, spec.gn_eps,
        )
    act = _activation_fn(spec.activation)
    return [act(o) for o in out]


def _res_block(xs, packed, films_i, bs: BlockSpec, spec: UnetSpec):
    k = spec.kernel_size
    taps = _conv_taps(bs.t, bs.t, k, 1, k // 2)
    out = _conv_block(xs, packed, bs.name, 0, spec, bs.cin, bs.cout, taps)
    if spec.cond_predict_scale:
        scale = films_i[f"{bs.name}/scale"]
        bias = films_i[f"{bs.name}/bias"]
        out = [scale * o + bias for o in out]
    else:
        e = films_i[f"{bs.name}/bias"]
        out = [o + e for o in out]
    out = _conv_block(out, packed, bs.name, 1, spec, bs.cout, bs.cout, taps)
    if bs.has_residual_conv:
        w = packed[f"{bs.name}/res_w"]
        b = packed[f"{bs.name}/res_b"]
        res = [
            jnp.dot(xt, w, preferred_element_type=jnp.float32) + b
            for xt in xs
        ]
    else:
        res = xs
    return [o + r for o, r in zip(out, res)]


def unet_trunk_step(packed, films_i, spec: UnetSpec, x_rows):
    """One denoiser forward. x_rows: list of Ta (B, C0p) rows (action in
    cols [:action_dim]); returns list of Ta (B, C0p?) eps rows (action cols
    [:action_dim])."""
    xs = x_rows
    skips = []
    for (res1, res2), ds in zip(spec.down_blocks, spec.down_samples):
        xs = _res_block(xs, packed, films_i, res1, spec)
        xs = _res_block(xs, packed, films_i, res2, spec)
        skips.append(xs)
        if ds is not None:
            xs = _conv_t(xs, packed[f"{ds.name}/w"], packed[f"{ds.name}/b"],
                         ds.taps)
    for bs in spec.mid_blocks:
        xs = _res_block(xs, packed, films_i, bs, spec)
    skips.pop(0)  # the first skip is never consumed (reference structure)
    for (skip_c, res1, res2), us in zip(spec.up_blocks, spec.up_samples):
        skip = skips.pop()
        cat_p = _cp(res1.cin)
        x_c = res1.cin - skip_c  # channels of x before concat
        xs = [
            jnp.zeros((xt.shape[0], cat_p), jnp.float32)
            .at[:, :x_c].set(xt[:, :x_c])
            .at[:, x_c:x_c + skip_c].set(st[:, :skip_c])
            for xt, st in zip(xs, skip)
        ]
        xs = _res_block(xs, packed, films_i, res1, spec)
        xs = _res_block(xs, packed, films_i, res2, spec)
        if us is not None:
            xs = _conv_t(xs, packed[f"{us.name}/w"], packed[f"{us.name}/b"],
                         us.taps)
    # final conv block + 1x1 head
    k = spec.kernel_size
    taps = _conv_taps(spec.horizon, spec.horizon, k, 1, k // 2)
    out = _conv_t(xs, packed["final_block/w"], packed["final_block/b"], taps)
    if spec.n_groups is not None:
        out = _groupnorm(
            out, packed[f"gn_mask/{spec.final_cin}"],
            packed["final_block/gns"], packed["final_block/gnb"],
            spec.final_cin, spec.n_groups, spec.gn_eps,
        )
    act = _activation_fn(spec.activation)
    out = [act(o) for o in out]
    w = packed["final_conv/w"]
    b = packed["final_conv/b"]
    return [
        jnp.dot(o, w, preferred_element_type=jnp.float32) + b for o in out
    ]


# ---------------------------------------------------------------------------
# pallas chain kernel
# ---------------------------------------------------------------------------

def fused_unet_chain(
    packed: dict,
    films: dict,  # (K, B, Cp) planes per block
    coefs,  # (8, K) f32
    x0,  # (B, x_dim)
    noise,  # (K, B, x_dim)
    spec: UnetSpec,
):
    """Whole-chain U-Net sampler kernel. Returns the chain (K+1, B, x_dim).

    Same posterior row layout as `fused_chain._chain_kernel`:
    coefs rows = c1, c2, mu1, mu2, std, denoised_clip, final_flag, final_val.
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = coefs.shape[1]
    B = x0.shape[0]
    Bp = _round_up(B, SUBLANE)
    Ta, Da = spec.horizon, spec.action_dim
    x_dim = Ta * Da
    XP = _cp(x_dim)
    C0P = _cp(Da)

    x0_p = jnp.zeros((Bp, XP), jnp.float32).at[:B, :x_dim].set(x0)
    noise_p = (
        jnp.zeros((K, Bp, XP), jnp.float32).at[:, :B, :x_dim].set(noise)
    )
    films_p = {
        k: jnp.zeros((K, Bp) + v.shape[2:], jnp.float32).at[:, :B].set(v)
        for k, v in films.items()
    }

    pkeys = sorted(packed)
    fkeys = sorted(films_p)

    def kernel(coef_ref, x0_ref, noise_ref, *refs):
        prefs = dict(zip(pkeys, refs[: len(pkeys)]))
        frefs = dict(zip(fkeys, refs[len(pkeys): len(pkeys) + len(fkeys)]))
        chain_ref = refs[len(pkeys) + len(fkeys)]
        packed_v = {k: prefs[k][:] for k in pkeys}

        x = x0_ref[:]
        chain_ref[0] = x

        def step(i, x):
            films_i = {k: frefs[k][i] for k in fkeys}
            rows = [
                jax.lax.dynamic_update_slice(
                    jnp.zeros((Bp, C0P), jnp.float32),
                    jax.lax.dynamic_slice(
                        x, (0, ti * Da), (Bp, Da)
                    ),
                    (0, 0),
                )
                for ti in range(Ta)
            ]
            eps_rows = unet_trunk_step(packed_v, films_i, spec, rows)
            eps = jnp.zeros((Bp, XP), jnp.float32)
            for ti in range(Ta):
                eps = jax.lax.dynamic_update_slice(
                    eps, eps_rows[ti][:, :Da], (0, ti * Da)
                )
            c1 = coef_ref[0, i]
            c2 = coef_ref[1, i]
            mu1 = coef_ref[2, i]
            mu2 = coef_ref[3, i]
            std = coef_ref[4, i]
            dclip = coef_ref[5, i]
            fflag = coef_ref[6, i]
            fval = coef_ref[7, i]
            x_recon = c1 * x - c2 * eps
            x_recon = jnp.clip(x_recon, -dclip, dclip)
            mean = mu1 * x_recon + mu2 * x
            new_x = mean + std * noise_ref[i]
            new_x = jnp.where(
                fflag > 0.5, jnp.clip(new_x, -fval, fval), new_x
            )
            chain_ref[i + 1] = new_x
            return new_x

        jax.lax.fori_loop(0, K, step, x)

    w_elems = sum(int(np.prod(packed[k].shape)) for k in pkeys)
    f_elems = sum(int(np.prod(films_p[k].shape)) for k in fkeys)
    chain = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K + 1, Bp, XP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(pkeys) + len(fkeys)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Bp * w_elems,
            bytes_accessed=4 * (w_elems + f_elems + (K + 1) * Bp * XP),
            transcendentals=0,
        ),
    )(
        coefs,
        x0_p,
        noise_p,
        *[packed[k] for k in pkeys],
        *[films_p[k] for k in fkeys],
    )
    return chain[:, :B, :x_dim]


class FusedUnetChainSampler(FusedChainSampler):
    """FusedChainSampler variant for Unet1D / VisionUnet1D denoisers.

    Reuses the posterior coefficient machinery (`_coefs` / `_coefs_ddim`)
    and the VPGDiffusion.sample semantics; the trunk runs through the
    whole-chain U-Net kernel. Vision trunks enter through the cond-hoist:
    the ViT/SpatialEmb feature is encoded ONCE outside (encode_cond_once)
    and concatenated with the proprio state into the U-Net condition,
    exactly as `VisionUnet1D.__call__` does post-encoder.

    Restrictions (validated at construction): fixed η (no eta module, or
    EtaFixed — the shipped U-Net recipes), no eps clip, fp32 sampling.
    """

    def __init__(self, model):
        assert getattr(model, "sample_network_dtype", None) is None, (
            "fused unet chain kernel computes in fp32"
        )
        net = model.network
        kind = type(net).__name__
        assert kind in ("Unet1D", "VisionUnet1D"), (
            f"FusedUnetChainSampler requires Unet1D/VisionUnet1D, got {kind}"
        )
        self.vision = kind == "VisionUnet1D"
        inner = net  # Unet1D fields live on VisionUnet1D too (shared names)
        if model.use_ddim:
            assert model.eps_clip_value is None, (
                "fused DDIM path does not support eps_clip_value"
            )
            em = model.eta_module
            assert em is None or type(em).__name__ == "EtaFixed", (
                "fused unet kernel supports fixed eta only"
            )
        self.per_sample_eta = False
        self.model = model
        self.x_dim = model.horizon_steps * model.action_dim
        # build the trunk spec from the (inner) unet fields
        class _N:  # adapter: VisionUnet1D carries the same field names
            action_dim = inner.action_dim
            dim = inner.dim
            dim_mults = inner.dim_mults
            kernel_size = inner.kernel_size
            n_groups = inner.n_groups
            groupnorm_eps = inner.groupnorm_eps
            cond_predict_scale = inner.cond_predict_scale
            activation_type = inner.activation_type

        self.spec = build_unet_spec(_N, model.horizon_steps)
        self.cond_mlp_dims = (
            list(inner.cond_mlp_dims) if inner.cond_mlp_dims else None
        )
        self.dsed = inner.diffusion_step_embed_dim

    def _trunk_params(self, actor_params):
        """The inner Unet1D subtree ('unet' for VisionUnet1D)."""
        if self.vision:
            return {"params": actor_params["params"]["unet"]}
        return actor_params

    def _cond_state(self, actor_params, cond):
        """The U-Net condition: [visual feature (hoisted ViT) | proprio]."""
        B = cond["state"].shape[0]
        state = cond["state"].reshape(B, -1)
        if not self.vision:
            return state
        feat = self.model.encode_cond_once(actor_params, cond)
        assert feat is not None
        return jnp.concatenate([feat, state], axis=-1)

    def __call__(
        self, params, cond, rng, deterministic: bool = False,
        use_base_policy: bool = False,
    ):
        from dppo_tpu.diffusion.core import Sample

        m = self.model
        K, K_ft = m.n_sampling_steps, m.ft_denoising_steps
        B = cond["state"].shape[0]
        if m.use_ddim:
            coefs = self._coefs_ddim(params, cond, deterministic)
        else:
            coefs = jnp.asarray(self._coefs(deterministic))
        t_sched = m.t_schedule()
        base_steps = K - K_ft

        rng_x, rng_n = jax.random.split(rng)
        x0 = jax.random.normal(rng_x, (B, self.x_dim))
        noise = jnp.clip(
            jax.random.normal(rng_n, (K, B, self.x_dim)),
            -m.randn_clip_value,
            m.randn_clip_value,
        )

        sample_actor = params.actor if use_base_policy else params.actor_ft

        def prep(actor_params):
            trunk = self._trunk_params(actor_params)
            packed = pack_unet1d(trunk, self.spec)
            state = self._cond_state(actor_params, cond)
            films = precompute_unet_film(
                trunk, self.spec, t_sched, state,
                self.cond_mlp_dims, state.shape[-1], self.dsed,
            )
            return packed, films

        packed_base, films_base = prep(params.actor)
        packed_ft, films_ft = prep(sample_actor)

        def launch(packed, films, x_start, lo, hi):
            films_w = {k: v[lo:hi] for k, v in films.items()}
            return fused_unet_chain(
                packed, films_w, coefs[:, lo:hi], x_start, noise[lo:hi],
                self.spec,
            )

        if base_steps == 0:
            chain = launch(packed_ft, films_ft, x0, 0, K)
        elif base_steps == K:
            chain = launch(packed_base, films_base, x0, 0, K)
        else:
            chain_a = launch(packed_base, films_base, x0, 0, base_steps)
            chain_b = launch(packed_ft, films_ft, chain_a[-1], base_steps, K)
            chain = jnp.concatenate([chain_a, chain_b[1:]], axis=0)

        Ta, Da = m.horizon_steps, m.action_dim
        chain_actions = chain.reshape(K + 1, B, Ta, Da)
        traj = chain_actions[-1]
        recorded = jnp.swapaxes(chain_actions[K - K_ft :], 0, 1)
        return Sample(traj, recorded)
