"""Diffusion Q-Learning (DQL).

Parity with `model/diffusion/diffusion_dql.py` (DQLDiffusion:17): double-Q TD
critic with target network (`loss_critic:43`), actor loss = BC ε-MSE +
η · normalized (−Q) through a **differentiable** full denoising chain
(`loss_actor:74`, `forward_train:141`), Polyak target updates (`:90`).
The reference's `np.random.uniform() > 0.5` choice of which Q head drives
the actor becomes an explicit rng argument.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dppo_tpu.diffusion.core import DiffusionModel, _randn_clipped


def polyak(target_tree, source_tree, tau):
    return jax.tree_util.tree_map(
        lambda t, s: t * (1.0 - tau) + s * tau, target_tree, source_tree
    )


class DQLParams(NamedTuple):
    actor: Any
    critic: Any
    critic_target: Any


class DQLDiffusion(DiffusionModel):
    def __init__(
        self,
        actor,
        critic,
        use_ddim: bool = False,
        min_sampling_denoising_std: float = 0.1,
        **kwargs: Any,
    ):
        super().__init__(network=actor, use_ddim=use_ddim, **kwargs)
        assert not self.use_ddim, "DQL does not support DDIM"
        self.critic = critic
        self.min_sampling_denoising_std = min_sampling_denoising_std

    def init_dql_params(self, rng, cond: dict, example_action) -> DQLParams:
        r_actor, r_critic = jax.random.split(rng)
        critic_params = self.critic.init(r_critic, cond, example_action)
        return DQLParams(
            actor=self.load_params(r_actor, cond=cond),
            critic=critic_params,
            critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
        )

    # ---------- sampling (stochastic, min-std floor) ----------
    def _chain(self, actor_params, cond, rng, deterministic):
        B = (cond["state"] if "state" in cond else cond["rgb"]).shape[0]
        K = self.denoising_steps
        t_all = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)
        rng, xr = jax.random.split(rng)
        x = jax.random.normal(xr, (B, self.horizon_steps, self.action_dim))

        def step(carry, it):
            x, rng = carry
            i, t = it
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            mean, logvar = self.p_mean_var(actor_params, x, t_b, cond)
            std = jnp.exp(0.5 * logvar)
            if deterministic:
                std = jnp.where(t == 0, 0.0, jnp.clip(std, 1e-3, None))
            else:
                std = jnp.clip(std, self.min_sampling_denoising_std, None)
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

        (x, _), _ = jax.lax.scan(
            step, (x, rng), (jnp.arange(K, dtype=jnp.int32), t_all)
        )
        return x

    def forward(self, params: DQLParams, cond, rng, deterministic: bool = False):
        return jax.lax.stop_gradient(
            self._chain(params.actor, cond, rng, deterministic)
        )

    sample = forward
    __call__ = forward

    def forward_train(self, actor_params, cond, rng, deterministic: bool = False):
        """Differentiable chain for the actor loss (parity: :141-179)."""
        return self._chain(actor_params, cond, rng, deterministic)

    # ---------- losses ----------
    def loss_critic(
        self, critic_params, params: DQLParams, obs, next_obs, actions,
        rewards, terminated, gamma, rng,
    ):
        q1, q2 = self.critic.apply(critic_params, obs, actions)
        next_actions = jax.lax.stop_gradient(
            self._chain(params.actor, next_obs, rng, deterministic=False)
        )
        nq1, nq2 = self.critic.apply(params.critic_target, next_obs, next_actions)
        next_q = jnp.minimum(nq1, nq2)
        mask = 1.0 - terminated.reshape(-1)
        target_q = rewards.reshape(-1) + gamma * next_q.reshape(-1) * mask
        target_q = jax.lax.stop_gradient(target_q)
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

    def bc_loss(self, actor_params, rng, x_start, cond):
        B = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.denoising_steps)
        noise = jax.random.normal(rng_n, x_start.shape)
        x_noisy = self.q_sample(x_start, t, noise)
        x_recon = self.network.apply(actor_params, x_noisy, t, cond)
        target = noise if self.predict_epsilon else x_start
        return jnp.mean((x_recon - target) ** 2)

    def loss_actor(
        self, actor_params, params: DQLParams, obs, eta, act_steps, rng
    ):
        rng_chain, rng_bc, rng_pick = jax.random.split(rng, 3)
        action_new = self.forward_train(
            actor_params, obs, rng_chain, deterministic=False
        )[:, :act_steps]
        q1, q2 = self.critic.apply(params.critic, obs, action_new)
        bc = self.bc_loss(actor_params, rng_bc, action_new, obs)
        pick_first = jax.random.uniform(rng_pick) > 0.5
        q_loss = jnp.where(
            pick_first,
            -q1.mean() / jax.lax.stop_gradient(jnp.abs(q2).mean()),
            -q2.mean() / jax.lax.stop_gradient(jnp.abs(q1).mean()),
        )
        return bc + eta * q_loss

    def update_target_critic(self, params: DQLParams, tau) -> DQLParams:
        return params._replace(
            critic_target=polyak(params.critic_target, params.critic, tau)
        )
