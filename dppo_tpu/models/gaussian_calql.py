"""Cal-QL — calibrated conservative Q-learning, Gaussian policy.

Parity with `model/rl/gaussian_calql.py` (CalQL_Gaussian:18): double-Q TD
loss with max-over-samples bootstrap, CQL logsumexp penalty over (random,
π(s), π(s')) actions with importance correction, calibration of policy Q
values against Monte-Carlo returns (`loss_critic:56-172`), SAC-style actor /
temperature losses (:173-193). The reference's importance weight
`log_rand_pi = 0.5 ** prod(H, A)` (a probability, despite the name,
`:103`) is reproduced verbatim for parity.

Documented deviation: in the reference's CQL penalty, `q_pi - log_pi`
subtracts a (B,) log-prob from a (B, 1) calibrated Q
(`gaussian_calql.py:144-147`), silently broadcasting the importance-sample
set to (B, n_rand + 2B) before the logsumexp. Here the set follows CQL's
published (B, n_rand + 2) form. The TD + max-backup part is oracle-equal;
the quirk itself is pinned in tests/test_reference_parity_offpolicy3.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.diffusion.dql import polyak
from dppo_tpu.models.gaussian import GaussianModel


class CalQLParams(NamedTuple):
    actor: Any
    critic: Any
    critic_target: Any
    log_alpha: Any


class CalQLGaussian(GaussianModel):
    def __init__(
        self,
        actor,
        critic,
        network_path=None,
        cql_clip_diff_min: float = -np.inf,
        cql_clip_diff_max: float = np.inf,
        cql_min_q_weight: float = 5.0,
        cql_n_actions: int = 10,
        **kwargs: Any,
    ):
        super().__init__(network=actor, network_path=network_path, **kwargs)
        self.critic = critic
        self.cql_clip_diff_min = cql_clip_diff_min
        self.cql_clip_diff_max = cql_clip_diff_max
        self.cql_min_q_weight = cql_min_q_weight
        self.cql_n_actions = int(cql_n_actions)

    def init_calql_params(
        self, rng, cond: dict, example_action, init_temperature: float = 1.0
    ) -> CalQLParams:
        r_actor, r_critic = jax.random.split(rng)
        critic_params = self.critic.init(r_critic, cond, example_action)
        params = CalQLParams(
            actor=self.load_params(r_actor, cond=cond),
            critic=critic_params,
            critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
            log_alpha=jnp.log(jnp.asarray(init_temperature)),
        )
        # Cal-QL checkpoints store the whole params tree (actor+critic)
        if self.network_path is not None:
            from dppo_tpu.utils.ckpt import load_checkpoint

            data = load_checkpoint(self.network_path)
            model = data.get("model")
            if model is not None and hasattr(model, "critic"):
                params = jax.tree_util.tree_map(jnp.asarray, model)
        return params

    def loss_critic(
        self, critic_params, params: CalQLParams, obs, next_obs, actions,
        random_actions, rewards, returns, terminated, gamma, rng,
    ):
        B = actions.shape[0]
        S = self.cql_n_actions
        r_next, r_pi, r_pi_next = jax.random.split(rng, 3)
        q_data1, q_data2 = self.critic.apply(critic_params, obs, actions)

        # --- bootstrap: best of S sampled next actions ---
        next_rep = {
            "state": jnp.repeat(next_obs["state"], S, axis=0)
        }
        next_actions, next_logprobs = self.forward(
            params.actor, next_rep, r_next, deterministic=False,
            get_logprob=True,
        )
        nq1, nq2 = self.critic.apply(
            params.critic_target, next_rep, next_actions
        )
        next_q = jnp.minimum(nq1, nq2).reshape(B, S)
        next_q = jnp.max(next_q, axis=1)
        target_q = jax.lax.stop_gradient(
            rewards + gamma * (1.0 - terminated) * next_q
        )
        td_loss = jnp.mean((q_data1 - target_q) ** 2) + jnp.mean(
            (q_data2 - target_q) ** 2
        )

        # --- CQL penalty ---
        H, A = actions.shape[-2:]
        log_rand_pi = 0.5 ** (H * A)  # parity with reference :103
        pi_actions, log_pi = self.forward(
            params.actor, obs, r_pi, deterministic=False, get_logprob=True
        )
        pi_actions = jax.lax.stop_gradient(pi_actions)
        log_pi = jax.lax.stop_gradient(log_pi)
        pi_next_actions, log_pi_next = self.forward(
            params.actor, next_obs, r_pi_next, deterministic=False,
            get_logprob=True,
        )
        pi_next_actions = jax.lax.stop_gradient(pi_next_actions)
        log_pi_next = jax.lax.stop_gradient(log_pi_next)

        n_rand = random_actions.shape[1]
        obs_rep = {"state": jnp.repeat(obs["state"], n_rand, axis=0)}
        rand_flat = random_actions.reshape(B * n_rand, H, A)
        q_rand_1, q_rand_2 = self.critic.apply(critic_params, obs_rep, rand_flat)
        q_rand_1 = (q_rand_1 - log_rand_pi).reshape(B, n_rand)
        q_rand_2 = (q_rand_2 - log_rand_pi).reshape(B, n_rand)

        q_pi_1, q_pi_2 = self.critic.apply(critic_params, obs, pi_actions)
        q_pi_next_1, q_pi_next_2 = self.critic.apply(
            critic_params, next_obs, pi_next_actions
        )
        # calibration against MC returns
        q_pi_1 = jnp.maximum(q_pi_1, returns)[:, None]
        q_pi_2 = jnp.maximum(q_pi_2, returns)[:, None]
        q_pi_next_1 = jnp.maximum(q_pi_next_1, returns)[:, None]
        q_pi_next_2 = jnp.maximum(q_pi_next_2, returns)[:, None]
        q_pi_1 = q_pi_1 - log_pi[:, None]
        q_pi_2 = q_pi_2 - log_pi[:, None]
        q_pi_next_1 = q_pi_next_1 - log_pi_next[:, None]
        q_pi_next_2 = q_pi_next_2 - log_pi_next[:, None]

        cat_q_1 = jnp.concatenate([q_rand_1, q_pi_1, q_pi_next_1], axis=-1)
        cat_q_2 = jnp.concatenate([q_rand_2, q_pi_2, q_pi_next_2], axis=-1)
        cql_qf1_ood = jax.nn.logsumexp(cat_q_1, axis=-1)
        cql_qf2_ood = jax.nn.logsumexp(cat_q_2, axis=-1)
        cql1 = jnp.clip(
            cql_qf1_ood - q_data1, self.cql_clip_diff_min, self.cql_clip_diff_max
        ).mean()
        cql2 = jnp.clip(
            cql_qf2_ood - q_data2, self.cql_clip_diff_min, self.cql_clip_diff_max
        ).mean()
        return (
            td_loss
            + cql1 * self.cql_min_q_weight
            + cql2 * self.cql_min_q_weight
        )

    def loss_actor(self, actor_params, params: CalQLParams, obs, alpha, rng):
        action, logprob = self.forward(
            actor_params, obs, rng, deterministic=False, get_logprob=True
        )
        q1, q2 = self.critic.apply(params.critic, obs, action)
        return jnp.mean(-jnp.minimum(q1, q2) + alpha * logprob)

    def loss_temperature(
        self, log_alpha, params: CalQLParams, obs, target_entropy, rng
    ):
        _, logprob = self.forward(
            params.actor, obs, rng, deterministic=False, get_logprob=True
        )
        logprob = jax.lax.stop_gradient(logprob)
        return -jnp.mean(jnp.exp(log_alpha) * (logprob + target_entropy))

    def update_target_critic(self, params: CalQLParams, tau) -> CalQLParams:
        return params._replace(
            critic_target=polyak(params.critic_target, params.critic, tau)
        )

    def sample(self, params: CalQLParams, cond, rng, deterministic: bool = False):
        return self.forward(params.actor, cond, rng, deterministic=deterministic)

    __call__ = sample
