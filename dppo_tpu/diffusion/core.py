"""DDPM/DDIM diffusion policy core — pure-functional, jit/scan-native.

Capability parity with the reference `model/diffusion/diffusion.py`
(DiffusionModel:29): cosine-schedule table construction (:98-196), reverse
posterior `p_mean_var` (:200-259), the K-step eval sampler `forward`
(:262-314) with the reference's clip set (randn_clip, denoised_clip,
final_action_clip, DDIM eps_clip), BC loss `loss`→`p_losses` (:318-350) and
forward process `q_sample` (:352-363).

TPU-first design: the model object holds only *static* configuration and
precomputed tables; parameters are external pytrees, every method is a pure
function safe to call inside `jax.jit`/`lax.scan`/`shard_map`. The K-step
reverse process is a single `lax.scan` over stacked per-step coefficients —
one compiled program regardless of K, no Python-loop dispatch overhead.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.ops.schedule import (
    DDIMTables,
    DDPMTables,
    extract,
    make_ddim_tables,
    make_ddpm_tables,
)


class Sample(NamedTuple):
    trajectories: jnp.ndarray  # (B, Ta, Da)
    chains: Optional[jnp.ndarray]  # (B, K_ft + 1, Ta, Da) or None


def _randn_clipped(rng, shape, clip):
    return jnp.clip(jax.random.normal(rng, shape), -clip, clip)


class DiffusionModel:
    """Static config + pure methods for a DDPM/DDIM action-chunk policy."""

    def __init__(
        self,
        network,
        horizon_steps: int,
        obs_dim: int,
        action_dim: int,
        network_path: Optional[str] = None,
        device: Optional[str] = None,  # accepted for config parity; unused
        denoised_clip_value: Optional[float] = 1.0,
        randn_clip_value: float = 10.0,
        final_action_clip_value: Optional[float] = None,
        eps_clip_value: Optional[float] = None,  # DDIM only
        denoising_steps: int = 100,
        predict_epsilon: bool = True,
        use_ddim: bool = False,
        ddim_discretize: str = "uniform",
        ddim_steps: Optional[int] = None,
        sample_network_dtype: Optional[str] = None,
        **kwargs: Any,
    ):
        # opt-in reduced-precision SAMPLING: run the denoiser network in
        # bfloat16 during rollout sampling only (weights cast once per
        # sampler call, outside the K-step scan; all posterior math, losses,
        # and log-prob evaluation stay float32). No reference counterpart
        # (the reference samples in fp32) — a TPU-native throughput option:
        # the MXU natively computes bf16, and at rollout batch sizes the
        # forward is weight-streaming-bound, so halving weight bytes is a
        # direct speedup (~1.3x measured on v5e at the hopper operating
        # point). Exploration noise floors (min std 0.1) dominate bf16
        # rounding (~4e-3 on O(1) activations), and the PPO update
        # recomputes log-probs in fp32 from the recorded chains.
        if sample_network_dtype in (None, "float32", "fp32"):
            self.sample_network_dtype = None
        elif sample_network_dtype in ("bfloat16", "bf16"):
            self.sample_network_dtype = jnp.bfloat16
        else:
            raise ValueError(
                "sample_network_dtype must be float32 or bfloat16, got "
                f"{sample_network_dtype!r}"
            )
        self.network = network
        self.horizon_steps = int(horizon_steps)
        self.obs_dim = int(obs_dim)
        self.action_dim = int(action_dim)
        self.network_path = network_path
        self.denoising_steps = int(denoising_steps)
        self.predict_epsilon = predict_epsilon
        self.use_ddim = use_ddim
        self.ddim_steps = int(ddim_steps) if ddim_steps is not None else None
        self.denoised_clip_value = denoised_clip_value
        self.randn_clip_value = randn_clip_value
        self.final_action_clip_value = final_action_clip_value
        self.eps_clip_value = eps_clip_value

        self.ddpm: DDPMTables = make_ddpm_tables(self.denoising_steps)
        self.ddim: Optional[DDIMTables] = None
        if use_ddim:
            assert predict_epsilon, "DDIM requires predicting epsilon."
            self.ddim = make_ddim_tables(
                self.denoising_steps, self.ddim_steps, ddim_discretize
            )

    # ---------- setup ----------
    @property
    def n_sampling_steps(self) -> int:
        return self.ddim_steps if self.use_ddim else self.denoising_steps

    def t_schedule(self) -> jnp.ndarray:
        """Timesteps in sampling order, index i -> timestep t (K,) int32."""
        if self.use_ddim:
            return self.ddim.t
        return jnp.arange(self.denoising_steps - 1, -1, -1, dtype=jnp.int32)

    def init_params(self, rng, batch_size: int = 1, cond: Optional[dict] = None):
        if cond is None:
            cond = {
                "state": jnp.zeros(
                    (batch_size, 1, self.obs_dim), dtype=jnp.float32
                )
            }
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        x = jnp.zeros(
            (B, self.horizon_steps, self.action_dim), dtype=jnp.float32
        )
        t = jnp.zeros((B,), dtype=jnp.int32)
        return self.network.init(rng, x, t, cond)

    def load_params(self, rng=None, cond: Optional[dict] = None):
        """Load pretrain checkpoint (EMA weights if present — parity with
        `diffusion.py:77-86`), or fresh-init when no path was given."""
        from dppo_tpu.utils.ckpt import load_checkpoint

        if self.network_path is not None:
            data = load_checkpoint(self.network_path)
            params = data.get("ema", data.get("model"))
            if params is None:
                raise ValueError(f"no model/ema key in {self.network_path}")
            return jax.tree_util.tree_map(jnp.asarray, params)
        assert rng is not None, "need rng to init params without a checkpoint"
        return self.init_params(rng, cond=cond)

    # ---------- reverse process ----------
    # ---------- reduced-precision sampling helpers ----------
    def cast_sampling_params(self, actor_params):
        """Cast one actor tree to the sampling dtype (no-op when fp32).
        Call OUTSIDE the denoising scan so the cast happens once."""
        dt = self.sample_network_dtype
        if dt is None:
            return actor_params
        return jax.tree_util.tree_map(
            lambda v: v.astype(dt)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            actor_params,
        )

    def _net_apply(self, params, x, t, cond, net=None, cond_feat=None):
        """Denoiser forward in the params' own float dtype; fp32 out.
        When the caller passed bf16-cast params (sampling path), inputs are
        cast to match so the matmuls run in bf16 on the MXU.
        cond_feat: pre-encoded visual/point condition feature (the
        TPU-native cond-hoist — see encode_cond_once)."""
        net = net if net is not None else self.network
        kw = {} if cond_feat is None else {"cond_feat": cond_feat}
        leaves = jax.tree_util.tree_leaves(params)
        pdt = next(
            (l.dtype for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)),
            jnp.float32,
        )
        if pdt == jnp.float32:
            return net.apply(params, x, t, cond, **kw)
        cast = lambda v: (
            v.astype(pdt) if jnp.issubdtype(v.dtype, jnp.floating) else v
        )
        out = net.apply(
            params, cast(x), t, jax.tree_util.tree_map(cast, cond),
            **jax.tree_util.tree_map(cast, kw),
        )
        return out.astype(jnp.float32)

    def encode_cond_once(self, params, cond, net=None):
        """One encoder pass over the loop-invariant condition (TPU-native
        cond-hoist): for networks whose `cond` encoder (ViT/SpatialEmb/point
        encoder) does not depend on (x, t), samplers call this ONCE per
        chain and thread the returned feature through every denoise step as
        `cond_feat`, skipping the encoder inside the K-step scan. At the
        96x96 reference pixel operating point the ViT is ~20x the trunk
        FLOPs, so the hoist multiplies pixel sampling throughput ~K-fold on
        the encoder share. Returns None for networks without a separable
        encoder (plain DiffusionMLP etc.) — callers pass cond_feat=None and
        nothing changes. No reference counterpart (the torch reference
        re-encodes every step, mlp_diffusion.py:19).
        """
        net = net if net is not None else self.network
        if getattr(self, "disable_cond_hoist", False):
            return None
        if not getattr(net, "supports_cond_feat", False):
            return None
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        x0 = jnp.zeros((B, self.horizon_steps, self.action_dim))
        t0 = jnp.zeros((B,), dtype=jnp.int32)
        leaves = jax.tree_util.tree_leaves(params)
        pdt = next(
            (l.dtype for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)),
            jnp.float32,
        )
        if pdt != jnp.float32:
            cast = lambda v: (
                v.astype(pdt) if jnp.issubdtype(v.dtype, jnp.floating) else v
            )
            x0 = cast(x0)
            cond = jax.tree_util.tree_map(cast, cond)
        _, feat = net.apply(params, x0, t0, cond, return_cond_feat=True)
        return feat

    def p_mean_var(
        self, params, x, t, cond, index=None, network_override=None,
        cond_feat=None,
    ):
        """Posterior mean and log-variance of p(x_{t-1} | x_t).

        x: (B, Ta, Da); t: (B,) int; index: (B,) int DDIM sampling index.
        Parity: `diffusion.py:200-259`.
        """
        noise = self._net_apply(
            params, x, t, cond, net=network_override, cond_feat=cond_feat
        )

        if self.predict_epsilon:
            if self.use_ddim:
                alpha = extract(self.ddim.alphas, index, x.ndim)
                alpha_prev = extract(self.ddim.alphas_prev, index, x.ndim)
                sqrt_one_minus_alpha = extract(
                    self.ddim.sqrt_one_minus_alphas, index, x.ndim
                )
                x_recon = (x - sqrt_one_minus_alpha * noise) / jnp.sqrt(alpha)
            else:
                x_recon = (
                    extract(self.ddpm.sqrt_recip_alphas_cumprod, t, x.ndim) * x
                    - extract(self.ddpm.sqrt_recipm1_alphas_cumprod, t, x.ndim)
                    * noise
                )
        else:
            x_recon = noise
        if self.denoised_clip_value is not None:
            x_recon = jnp.clip(
                x_recon, -self.denoised_clip_value, self.denoised_clip_value
            )
            if self.use_ddim:
                # re-derive epsilon from the clamped x0 (diffusion.py:230-232)
                noise = (x - jnp.sqrt(alpha) * x_recon) / sqrt_one_minus_alpha
        if self.use_ddim and self.eps_clip_value is not None:
            noise = jnp.clip(noise, -self.eps_clip_value, self.eps_clip_value)

        if self.use_ddim:
            sigma = extract(self.ddim.sigmas, index, x.ndim)
            dir_xt = (
                jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sigma**2, 1e-12))
                * noise
            )
            mu = jnp.sqrt(alpha_prev) * x_recon + dir_xt
            logvar = jnp.log(jnp.maximum(sigma**2, 1e-38))
        else:
            mu = (
                extract(self.ddpm.ddpm_mu_coef1, t, x.ndim) * x_recon
                + extract(self.ddpm.ddpm_mu_coef2, t, x.ndim) * x
            )
            logvar = extract(self.ddpm.ddpm_logvar_clipped, t, x.ndim)
        return mu, logvar

    # ---------- sampling ----------
    def forward(self, params, cond, rng, deterministic: bool = True) -> Sample:
        """K-step eval sampler as one `lax.scan` (parity: diffusion.py:262-314)."""
        B = cond["state"].shape[0] if "state" in cond else cond["rgb"].shape[0]
        K = self.n_sampling_steps
        t_all = self.t_schedule()
        rng, xr = jax.random.split(rng)
        x = jax.random.normal(xr, (B, self.horizon_steps, self.action_dim))
        index_all = jnp.arange(K, dtype=jnp.int32)
        params = self.cast_sampling_params(params)
        cond_feat = self.encode_cond_once(params, cond)

        def step(carry, it):
            x, rng = carry
            i, t = it
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            index_b = jnp.full((B,), i, dtype=jnp.int32)
            mean, logvar = self.p_mean_var(
                params, x, t_b, cond, index=index_b, cond_feat=cond_feat
            )
            std = jnp.exp(0.5 * logvar)
            if self.use_ddim:
                std = jnp.zeros_like(std)
            else:
                std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
            rng, nr = jax.random.split(rng)
            noise = _randn_clipped(nr, x.shape, self.randn_clip_value)
            x = mean + std * noise
            if self.final_action_clip_value is not None:
                x = jnp.where(
                    i == K - 1,
                    jnp.clip(
                        x,
                        -self.final_action_clip_value,
                        self.final_action_clip_value,
                    ),
                    x,
                )
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (x, rng), (index_all, t_all))
        return Sample(x, None)

    __call__ = forward

    # ---------- supervised training ----------
    def q_sample(self, x_start, t, noise):
        """xₜ = √α̅ₜ x₀ + √(1−α̅ₜ) ε (parity: diffusion.py:352-363)."""
        return (
            extract(self.ddpm.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(self.ddpm.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise
        )

    def loss(self, params, rng, x_start, cond):
        """ε-MSE BC loss with uniform random t (parity: diffusion.py:318-350)."""
        B = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.denoising_steps)
        noise = jax.random.normal(rng_n, x_start.shape)
        x_noisy = self.q_sample(x_start, t, noise)
        x_recon = self.network.apply(params, x_noisy, t, cond)
        target = noise if self.predict_epsilon else x_start
        return jnp.mean((x_recon - target) ** 2)
