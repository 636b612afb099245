"""Policy-gradient fine-tuning machinery for diffusion policies.

Capability parity with `model/diffusion/diffusion_vpg.py` (VPGDiffusion:27):
frozen base actor + trainable fine-tune actor covering the last
`ft_denoising_steps` of the reverse process (:54-58, :76-88), stochastic
chain-returning sampler (:228-315), Gaussian log-probs of chain transitions
(:319-461), sampling/logprob std floors (:61-64), ft-step annealing (:102),
learnable DDIM-η (:67-73, applied at :205-213).

TPU-first re-design (not a translation):

* The sampler is a `lax.scan` over the K sampling steps. The reference
  dispatches base/ft per *sample* inside each step (`diffusion_vpg.py:150-163`)
  — but during sampling the timestep is uniform across the batch and the
  base/ft boundary is static, so the sampler runs as two back-to-back scans
  each bound to ONE weight tree (base steps, then ft steps). The reference
  always runs the base actor on the full batch and overwrites ft rows — one
  wasted forward per step; we never compute an unused forward, and never
  stream more than one weight tree per step from HBM.
* Log-prob evaluation only ever touches fine-tuned steps (chains are recorded
  for the last K_ft+1 states only), so `get_logprobs*` runs a single actor —
  the reference again runs both and discards one (`:148-163`).
* The denoising chain is the scan's stacked output; the (K_ft+1)-window is a
  static slice, so chain shapes are jit-static.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.core import DiffusionModel, Sample, _randn_clipped
from dppo_tpu.ops.schedule import extract


def tree_select(pred, tree_true, tree_false):
    """Per-leaf select between two identically-shaped pytrees (jit-safe)."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), tree_true, tree_false
    )


class VPGParams(NamedTuple):
    """The complete learnable/frozen state of a fine-tuned diffusion policy."""

    actor: Any  # frozen pretrained actor (base policy)
    actor_ft: Any  # trainable clone covering the last K_ft steps
    critic: Any  # value function
    eta: Any = None  # optional learnable DDIM-eta params


class VPGDiffusion(DiffusionModel):
    def __init__(
        self,
        actor,
        critic,
        ft_denoising_steps: int,
        ft_denoising_steps_d: int = 0,
        ft_denoising_steps_t: int = 0,
        network_path: Optional[str] = None,
        min_sampling_denoising_std: float = 0.1,
        min_logprob_denoising_std: float = 0.1,
        eta=None,
        learn_eta: bool = False,
        **kwargs: Any,
    ):
        super().__init__(network=actor, network_path=network_path, **kwargs)
        assert ft_denoising_steps <= self.denoising_steps
        assert ft_denoising_steps <= (self.ddim_steps or 10**9) or not self.use_ddim
        assert not (learn_eta and not self.use_ddim), "Cannot learn eta with DDPM."
        self.ft_denoising_steps = int(ft_denoising_steps)
        self.ft_denoising_steps_d = ft_denoising_steps_d
        self.ft_denoising_steps_t = ft_denoising_steps_t
        self.ft_denoising_steps_cnt = 0
        self.min_sampling_denoising_std = min_sampling_denoising_std
        self.min_logprob_denoising_std = min_logprob_denoising_std
        self.actor = actor  # same network architecture for base and ft trees
        self.critic = critic
        self.eta_module = eta
        self.learn_eta = learn_eta

    # ---------- params ----------
    def init_vpg_params(self, rng, cond: dict) -> VPGParams:
        """Build (base, ft, critic, eta) trees; base/ft from the pretrain ckpt
        when available (parity: diffusion_vpg.py:76-98).

        Warm-start parity (diffusion_vpg.py:92-98): when `network_path`
        points at a TRAINED RL checkpoint (no "ema" key — a finetune-agent
        `{itr, model}` save whose model is a VPG params tree), the whole
        state loads non-strict: actor, actor_ft, critic, and eta are taken
        from the checkpoint where present, and fresh-initialized otherwise —
        so a new finetune run recovers the previous run's critic instead of
        re-learning it from scratch."""
        r_actor, r_critic, r_eta = jax.random.split(rng, 3)
        critic_params = self.critic.init(r_critic, cond)
        eta_params = None
        if self.eta_module is not None:
            eta_params = self.eta_module.init(r_eta, cond)

        if self.network_path is not None:
            from dppo_tpu.utils.ckpt import load_checkpoint

            data = load_checkpoint(self.network_path)
            if "ema" not in data:  # trained RL checkpoint
                tree = data.get("model")
                if tree is None:
                    raise ValueError(
                        f"no model/ema key in {self.network_path}"
                    )
                fields = (
                    tree._asdict() if hasattr(tree, "_asdict") else dict(tree)
                )
                if "actor" not in fields:
                    raise ValueError(
                        f"{self.network_path} has no 'ema' key but its "
                        "'model' is not a VPG params tree (no 'actor'); "
                        "cannot warm-start from it"
                    )

                def take(name, default):
                    v = fields.get(name)
                    if v is None:
                        return default
                    return jax.tree_util.tree_map(jnp.asarray, v)

                actor = take("actor", None)
                return VPGParams(
                    actor=actor,
                    actor_ft=take(
                        "actor_ft",
                        jax.tree_util.tree_map(jnp.copy, actor),
                    ),
                    critic=take("critic", critic_params),
                    eta=take("eta", eta_params),
                )

        actor_params = self.load_params(r_actor, cond=cond)
        return VPGParams(
            actor=actor_params,
            actor_ft=jax.tree_util.tree_map(jnp.copy, actor_params),
            critic=critic_params,
            eta=eta_params,
        )

    # ---------- annealing ----------
    def step(self):
        """Anneal ft_denoising_steps (host-side; changes static chain shapes,
        so jitted callers must be re-traced after it fires). Returns True if
        the window shrank and the caller must promote actor_ft -> actor
        (parity: diffusion_vpg.py:102-130)."""
        if not isinstance(self.min_sampling_denoising_std, float):
            self.min_sampling_denoising_std.step()
        self.ft_denoising_steps_cnt += 1
        if (
            self.ft_denoising_steps_d > 0
            and self.ft_denoising_steps_t > 0
            and self.ft_denoising_steps_cnt % self.ft_denoising_steps_t == 0
        ):
            self.ft_denoising_steps = max(
                0, self.ft_denoising_steps - self.ft_denoising_steps_d
            )
            return True
        return False

    def get_min_sampling_denoising_std(self) -> float:
        if isinstance(self.min_sampling_denoising_std, float):
            return self.min_sampling_denoising_std
        return self.min_sampling_denoising_std()

    # ---------- reverse step (ft variant, with eta) ----------
    def p_mean_var_ft(
        self,
        actor_params,
        x,
        t,
        cond,
        index=None,
        eta_value=None,
        network_override=None,
        cond_feat=None,
    ):
        """Posterior mean/logvar/eta with DDIM-η noise injection.

        Parity: diffusion_vpg.py:139-224 minus the per-sample dispatch (the
        caller chooses which actor tree to pass — see module docstring).
        eta_value: (B, 1) or (B, Da) from an eta module, or None -> DDIM η=0
        path is NOT taken here; for DDPM η is identically 1.
        """
        noise = self._net_apply(
            actor_params, x, t, cond, net=network_override, cond_feat=cond_feat
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
                noise = (x - jnp.sqrt(alpha) * x_recon) / sqrt_one_minus_alpha
        if self.use_ddim and self.eps_clip_value is not None:
            noise = jnp.clip(noise, -self.eps_clip_value, self.eps_clip_value)

        if self.use_ddim:
            if eta_value is None:
                etas = jnp.zeros((x.shape[0], 1, 1))
            else:
                etas = eta_value[:, None]  # (B, 1, 1 or Da)
            sigma = jnp.maximum(
                etas
                * jnp.sqrt(
                    (1 - alpha_prev) / (1 - alpha) * (1 - alpha / alpha_prev)
                ),
                1e-10,
            )
            # floor inside the sqrt: at the final DDIM step
            # 1 - alpha_prev - sigma^2 can be exactly <= 0 and sqrt'(0) = inf
            # would propagate NaN into d(loss)/d(eta)
            dir_xt_coef = jnp.sqrt(
                jnp.maximum(1.0 - alpha_prev - sigma**2, 1e-12)
            )
            mu = jnp.sqrt(alpha_prev) * x_recon + dir_xt_coef * noise
            logvar = jnp.log(sigma**2)
        else:
            mu = (
                extract(self.ddpm.ddpm_mu_coef1, t, x.ndim) * x_recon
                + extract(self.ddpm.ddpm_mu_coef2, t, x.ndim) * x
            )
            logvar = extract(self.ddpm.ddpm_logvar_clipped, t, x.ndim)
            etas = jnp.ones_like(mu)
        return mu, logvar, etas

    def _eta_value(self, params: VPGParams, cond, deterministic):
        if not self.use_ddim:
            return None
        if deterministic or self.eta_module is None or params.eta is None:
            B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
            return jnp.zeros((B, 1))
        return self.eta_module.apply(params.eta, cond)

    # ---------- sampling ----------
    def sample(
        self,
        params: VPGParams,
        cond: dict,
        rng,
        deterministic: bool = False,
        return_chain: bool = True,
        use_base_policy: bool = False,
    ) -> Sample:
        """Stochastic chain sampler (parity: diffusion_vpg.py:228-315).

        Returns trajectories (B, Ta, Da) and, if requested, the chain of the
        last K_ft denoising transitions: (B, K_ft + 1, Ta, Da).
        """
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        K = self.n_sampling_steps
        K_ft = self.ft_denoising_steps
        base_steps = K - K_ft  # first `base_steps` sampling indices use base
        t_all = self.t_schedule()
        index_all = jnp.arange(K, dtype=jnp.int32)
        min_std = self.get_min_sampling_denoising_std()
        eta_value = self._eta_value(params, cond, deterministic)

        rng, xr = jax.random.split(rng)
        x0 = jax.random.normal(xr, (B, self.horizon_steps, self.action_dim))

        sample_actor = params.actor if use_base_policy else params.actor_ft
        # bf16 sampling option: cast each tree once, outside the scans
        base_actor = self.cast_sampling_params(params.actor)
        sample_actor = self.cast_sampling_params(sample_actor)
        # TPU-native cond-hoist: the pixel/point encoder is loop-invariant
        # across the chain — encode once per actor tree, outside the scans
        base_feat = self.encode_cond_once(base_actor, cond)
        sample_feat = self.encode_cond_once(sample_actor, cond)

        def make_step(actor_params, cond_feat):
            # the base/ft boundary is static (`base_steps`), so the sampler
            # runs as two back-to-back scans each bound to ONE weight tree —
            # a per-step `tree_select` would make XLA stream BOTH trees from
            # HBM on every denoise step (the select can't be hoisted out of
            # the scan). Same math, same rng stream, half the weight traffic.
            def step(carry, it):
                x, rng = carry
                i, t = it
                t_b = jnp.full((B,), t, dtype=jnp.int32)
                index_b = jnp.full((B,), i, dtype=jnp.int32)
                mean, logvar, _ = self.p_mean_var_ft(
                    actor_params, x, t_b, cond, index=index_b,
                    eta_value=eta_value, cond_feat=cond_feat,
                )
                std = jnp.exp(0.5 * logvar)
                if self.use_ddim:
                    std = (
                        jnp.zeros_like(std)
                        if deterministic
                        else jnp.clip(std, min_std, None)
                    )
                else:
                    if deterministic:
                        std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
                    else:
                        std = jnp.clip(std, min_std, None)
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
                return (x, rng), x

            return step

        carry, xs_base = jax.lax.scan(
            make_step(base_actor, base_feat),
            (x0, rng),
            (index_all[:base_steps], t_all[:base_steps]),
        )
        carry, xs_ft = jax.lax.scan(
            make_step(sample_actor, sample_feat),
            carry,
            (index_all[base_steps:], t_all[base_steps:]),
        )
        (x_final, _) = carry
        xs = jnp.concatenate([xs_base, xs_ft], axis=0)
        chain = None
        if return_chain:
            # states after each step, prepended with the initial noise; the
            # recorded window is the last K_ft + 1 states (chain-collection
            # parity: diffusion_vpg.py:263-311)
            full = jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)
            chain = full[:, K - K_ft :]
        return Sample(x_final, chain)

    forward = sample
    __call__ = sample

    # ---------- log-probs ----------
    def _ft_t_and_index(self):
        """Per-transition (t, ddim index) tables for the K_ft fine-tuned steps,
        ordered as chain transitions (parity: diffusion_vpg.py:351-370)."""
        K_ft = self.ft_denoising_steps
        if self.use_ddim:
            t_single = self.ddim.t[-K_ft:]
            indices_single = jnp.arange(
                self.ddim_steps - K_ft, self.ddim_steps, dtype=jnp.int32
            )
        else:
            t_single = jnp.arange(K_ft - 1, -1, -1, dtype=jnp.int32)
            indices_single = jnp.zeros((K_ft,), dtype=jnp.int32)  # unused
        return t_single, indices_single

    def _transition_logprob(
        self, actor_params, x_prev, x_next, t, index, cond, eta_value,
        cond_feat=None,
    ):
        """Gaussian log-density of one denoising transition, with std floor."""
        mean, logvar, eta = self.p_mean_var_ft(
            actor_params, x_prev, t, cond, index=index, eta_value=eta_value,
            cond_feat=cond_feat,
        )
        std = jnp.clip(jnp.exp(0.5 * logvar), self.min_logprob_denoising_std, None)
        logprob = (
            -0.5 * ((x_next - mean) / std) ** 2
            - jnp.log(std)
            - 0.5 * math.log(2 * math.pi)
        )
        return logprob, eta

    def get_logprobs(
        self,
        params: VPGParams,
        cond: dict,
        chains: jnp.ndarray,  # (B, K_ft+1, Ta, Da)
        get_ent: bool = False,
        use_base_policy: bool = False,
    ):
        """Log-probs of every transition in the recorded chain.

        Returns (B * K_ft, Ta, Da) in (batch-major, denoise-minor) order —
        layout parity with diffusion_vpg.py:319-396.
        """
        B = chains.shape[0]
        K_ft = self.ft_denoising_steps
        t_single, indices_single = self._ft_t_and_index()
        t_all = jnp.tile(t_single, (B,))
        index_all = jnp.tile(indices_single, (B,))
        actor_params = params.actor if use_base_policy else params.actor_ft
        # TPU-native cond-hoist: encode the B pixel/point conditions ONCE
        # and repeat only the small feature K_ft-fold — never the rgb
        # buffer (the reference repeats the full image batch per denoise
        # step, diffusion_vpg.py:319-396)
        feat = self.encode_cond_once(actor_params, cond)
        if feat is not None:
            feat_rep = jnp.repeat(feat, K_ft, axis=0)
            cond_small = {k: v for k, v in cond.items() if k not in ("rgb", "point")}
        else:
            feat_rep = None
            cond_small = cond
        cond_rep = jax.tree_util.tree_map(
            lambda v: jnp.repeat(v, K_ft, axis=0), cond_small
        )
        chains_prev = chains[:, :-1].reshape(
            B * K_ft, self.horizon_steps, self.action_dim
        )
        chains_next = chains[:, 1:].reshape(
            B * K_ft, self.horizon_steps, self.action_dim
        )
        eta_value = self._eta_value(params, cond_rep, deterministic=False)
        logprob, eta = self._transition_logprob(
            actor_params, chains_prev, chains_next, t_all, index_all, cond_rep,
            eta_value, cond_feat=feat_rep,
        )
        if get_ent:
            return logprob, eta
        return logprob

    def get_logprobs_subsample(
        self,
        params: VPGParams,
        cond: dict,
        chains_prev: jnp.ndarray,  # (B, Ta, Da)
        chains_next: jnp.ndarray,  # (B, Ta, Da)
        denoising_inds: jnp.ndarray,  # (B,)
        get_ent: bool = False,
        use_base_policy: bool = False,
    ):
        """Log-probs of randomly-subsampled denoising transitions — the PPO
        update hot path (parity: diffusion_vpg.py:398-461). One forward.
        """
        t_single, indices_single = self._ft_t_and_index()
        t_all = t_single[denoising_inds]
        index_all = indices_single[denoising_inds]
        actor_params = params.actor if use_base_policy else params.actor_ft
        eta_value = self._eta_value(params, cond, deterministic=False)
        logprob, eta = self._transition_logprob(
            actor_params, chains_prev, chains_next, t_all, index_all, cond,
            eta_value,
        )
        if get_ent:
            return logprob, eta
        return logprob

    # ---------- critic ----------
    def critic_value(self, params: VPGParams, cond: dict) -> jnp.ndarray:
        return self.critic.apply(params.critic, cond).reshape(-1)
