"""PPO fine-tuning of Gaussian/GMM policies.

Parity with `agent/finetune/train_ppo_gaussian_agent.py` (425 LoC): the DPPO
loop without the denoising dimension — stores sampled action chunks and flat
log-probs, one PPO surrogate per env macro-step. Shares the rollout/update
architecture of the diffusion agent: one jitted sampler call per macro-step,
one fused jitted program for the entire update.

Also serves GMM policies (`PPO_GMM`) — the model interface is identical.
"""

from __future__ import annotations

import logging
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import TrainPPOAgent, set_lr
from dppo_tpu.agents.finetune_ppo_diffusion import UpdateState
from dppo_tpu.utils.chunk import chunked_apply
from dppo_tpu.utils.reward_scaling import scale_rewards
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class TrainPPOGaussianAgent(TrainPPOAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.obs_dims = self._build_obs_dims()
        example_obs = self.venv.reset_arg()
        cond = {
            k: jnp.asarray(example_obs[k], dtype=jnp.float32)
            for k in self.obs_dims
        }
        params = self.model.init_vpg_params(self.next_rng(), cond)
        self.update_state = UpdateState(
            params=params,
            actor_opt=self.actor_optimizer.init(params.actor_ft),
            critic_opt=self.critic_optimizer.init(params.critic),
            eta_opt=None,
            reward_scaler=self.reward_scaler_state,
        )
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(p, c, r, deterministic=det),
            static_argnames=("det",),
        )
        self._jit_logprob = jax.jit(
            lambda p, c, a: self.model.get_logprobs(p, c, a)[0]
        )
        self._jit_update = jax.jit(self._update)

    def _build_obs_dims(self):
        return {"state": (self.n_cond_step, self.obs_dim)}

    def _augment_obs(self, obs_trajs: dict, rng) -> dict:
        return obs_trajs

    def _update(
        self,
        state: UpdateState,
        obs_trajs,  # {key: (S, E, To, ...)}
        samples_trajs,  # (S, E, Ta, Da)
        reward_trajs,  # (S, E)
        terminated_trajs,
        firsts_trajs,
        final_obs,  # {key: (E, To, ...)}
        rng,
        itr,
    ):
        model = self.model
        S, E = reward_trajs.shape
        SE = S * E
        rng, aug_rng = jax.random.split(rng)
        obs_trajs = self._augment_obs(obs_trajs, aug_rng)
        obs_flat = {
            k: v.reshape(SE, *v.shape[2:]) for k, v in obs_trajs.items()
        }
        samples_flat = samples_trajs.reshape(SE, *samples_trajs.shape[2:])

        # streamed in logprob_batch_size chunks (reference parity:
        # train_ppo_agent.py:22-25) to bound peak activation memory
        def recompute(obs_c, samples_c):
            v = model.critic_value(state.params, obs_c)
            lp, _, _ = model.get_logprobs(state.params, obs_c, samples_c)
            return v, lp

        values_flat, oldlogprobs = chunked_apply(
            recompute, self.logprob_batch_size, obs_flat, samples_flat
        )
        values_trajs = values_flat.reshape(S, E)
        oldlogprobs = jax.lax.stop_gradient(oldlogprobs)

        if self.reward_scale_running:
            scaler_state, reward_trajs = scale_rewards(
                state.reward_scaler, reward_trajs, firsts_trajs, gamma=0.99
            )
        else:
            scaler_state = state.reward_scaler

        next_value_last = model.critic_value(state.params, final_obs)

        def gae_step(lastgaelam, xs):
            reward_t, value_t, nextvalue_t, term_t = xs
            nonterminal = 1.0 - term_t
            delta = (
                reward_t * self.reward_scale_const
                + self.gamma * nextvalue_t * nonterminal
                - value_t
            )
            adv = delta + self.gamma * self.gae_lambda * nonterminal * lastgaelam
            return adv, adv

        nextvalues = jnp.concatenate(
            [values_trajs[1:], next_value_last[None]], axis=0
        )
        _, adv_rev = jax.lax.scan(
            gae_step,
            jnp.zeros((E,)),
            (
                reward_trajs[::-1],
                values_trajs[::-1],
                nextvalues[::-1],
                terminated_trajs[::-1],
            ),
        )
        advantages_trajs = adv_rev[::-1]
        returns_flat = (advantages_trajs + values_trajs).reshape(SE)
        advantages_flat = advantages_trajs.reshape(SE)

        total = SE
        num_batch = max(1, total // self.batch_size)
        bs = self.batch_size if total >= self.batch_size else total
        actor_lr = self.actor_lr(jnp.maximum(itr - self.n_critic_warmup_itr, 0))
        critic_lr = self.critic_lr(itr)
        actor_opt = set_lr(state.actor_opt, actor_lr)
        critic_opt = set_lr(state.critic_opt, critic_lr)

        perm_rngs = jax.random.split(rng, self.update_epochs + 1)
        perms = jax.vmap(lambda r: jax.random.permutation(r, total))(
            perm_rngs[1:]
        )
        mb_inds = perms[:, : num_batch * bs].reshape(
            self.update_epochs * num_batch, bs
        )
        bc_rngs = jax.random.split(perm_rngs[0], self.update_epochs * num_batch)

        def loss_fn(params, obs_b, act_b, ret_b, val_b, adv_b, olp_b, bc_rng):
            pg, ent, v, clipfrac, approx_kl, ratio, bc, std = model.loss(
                params,
                obs_b,
                act_b,
                ret_b,
                val_b,
                adv_b,
                olp_b,
                use_bc_loss=self.use_bc_loss,
                bc_rng=bc_rng,
            )
            total_loss = (
                pg + ent * self.ent_coef + v * self.vf_coef + bc * self.bc_loss_coeff
            )
            return total_loss, (pg, ent, v, clipfrac, approx_kl, ratio, bc, std)

        def minibatch_step(carry, xs):
            params, a_opt, c_opt, stop = carry
            inds_b, bc_rng = xs
            obs_b = {k: v[inds_b] for k, v in obs_flat.items()}
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                params,
                obs_b,
                samples_flat[inds_b],
                returns_flat[inds_b],
                values_flat[inds_b],
                advantages_flat[inds_b],
                oldlogprobs[inds_b],
                bc_rng,
            )
            pg, ent, v, clipfrac, approx_kl, ratio, bc, std = aux

            def apply(_):
                a_updates, a_state = self.actor_optimizer.update(
                    grads.actor_ft, a_opt, params.actor_ft
                )
                c_updates, c_state = self.critic_optimizer.update(
                    grads.critic, c_opt, params.critic
                )
                do_actor = itr >= self.n_critic_warmup_itr
                new_actor_ft = jax.tree_util.tree_map(
                    lambda p, u: jnp.where(do_actor, p + u, p),
                    params.actor_ft,
                    a_updates,
                )
                a_state_sel = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(do_actor, new, old), a_state, a_opt
                )
                return (
                    params._replace(
                        actor_ft=new_actor_ft,
                        critic=optax.apply_updates(params.critic, c_updates),
                    ),
                    a_state_sel,
                    c_state,
                )

            def skip(_):
                return params, a_opt, c_opt

            stop_entry = stop
            params, a_opt, c_opt = jax.lax.cond(stop, skip, apply, operand=None)
            if self.target_kl is not None:
                stop = jnp.logical_or(stop, approx_kl > self.target_kl)
            metrics = jnp.stack(
                [pg, ent, v, clipfrac, approx_kl, ratio, bc, std,
                 1.0 - stop_entry.astype(jnp.float32)]
            )
            return (params, a_opt, c_opt, stop), metrics

        (params, actor_opt, critic_opt, _), metrics = jax.lax.scan(
            minibatch_step,
            (state.params, actor_opt, critic_opt, jnp.asarray(False)),
            (mb_inds, bc_rngs),
        )
        applied = metrics[:, 8]
        n_applied = jnp.maximum(applied.sum(), 1.0)
        last_idx = jnp.maximum(applied.sum().astype(jnp.int32) - 1, 0)
        var_y = jnp.var(returns_flat)
        diag = {
            "pg_loss": metrics[last_idx, 0],
            "entropy_loss": metrics[last_idx, 1],
            "v_loss": metrics[last_idx, 2],
            "clipfrac": (metrics[:, 3] * applied).sum() / n_applied,
            "approx_kl": metrics[last_idx, 4],
            "ratio": metrics[last_idx, 5],
            "bc_loss": metrics[last_idx, 6],
            "std": metrics[last_idx, 7],
            "num_applied_batches": applied.sum(),
            "explained_variance": jnp.where(
                var_y > 0,
                1.0 - jnp.var(returns_flat - values_flat) / var_y,
                jnp.nan,
            ),
            "actor_lr": actor_lr,
            "critic_lr": critic_lr,
        }
        return (
            UpdateState(params, actor_opt, critic_opt, None, scaler_state),
            diag,
        )

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        last_itr_eval = False
        done_venv = np.zeros(self.n_envs, dtype=bool)
        prev_obs_venv = None
        while self.itr < self.n_train_itr:
            options_venv = [{} for _ in range(self.n_envs)]
            if (
                self.itr % self.render_freq == 0
                and self.render_video
                and self.n_render > 0
            ):
                for i in range(self.n_render):
                    options_venv[i]["video_path"] = os.path.join(
                        self.render_dir, f"itr-{self.itr}_trial-{i}.mp4"
                    )
            eval_mode = self.itr % self.val_freq == 0 and not self.force_train
            firsts_trajs = np.zeros((self.n_steps + 1, self.n_envs))
            if (
                self.reset_at_iteration
                or eval_mode
                or last_itr_eval
                or prev_obs_venv is None
            ):
                prev_obs_venv = self.reset_env_all(options_venv=options_venv)
                firsts_trajs[0] = 1
            else:
                firsts_trajs[0] = done_venv
            last_itr_eval = eval_mode

            obs_trajs = {
                k: np.zeros(
                    (self.n_steps, self.n_envs) + tuple(shape),
                    dtype=np.float32,
                )
                for k, shape in self.obs_dims.items()
            }
            samples_trajs = np.zeros(
                (self.n_steps, self.n_envs, self.horizon_steps, self.action_dim),
                dtype=np.float32,
            )
            reward_trajs = np.zeros((self.n_steps, self.n_envs), dtype=np.float32)
            terminated_trajs = np.zeros(
                (self.n_steps, self.n_envs), dtype=np.float32
            )

            for step in range(self.n_steps):
                cond = {
                    k: jnp.asarray(prev_obs_venv[k], jnp.float32)
                    for k in self.obs_dims
                }
                action_samples = self._jit_sample(
                    self.update_state.params, cond, self.next_rng(), eval_mode
                )
                output_venv = np.asarray(action_samples)
                action_venv = output_venv[:, : self.act_steps]
                # overlap buffer writes with simulator stepping (plain step
                # for external venvs without the split API)
                split = hasattr(self.venv, "step_async")
                if split:
                    self.venv.step_async(action_venv)
                for k in self.obs_dims:
                    obs_trajs[k][step] = prev_obs_venv[k]
                samples_trajs[step] = output_venv
                obs_venv, reward_venv, terminated_venv, truncated_venv, _ = (
                    self.venv.step_wait() if split
                    else self.venv.step(action_venv)
                )
                done_venv = terminated_venv | truncated_venv
                reward_trajs[step] = reward_venv
                terminated_trajs[step] = terminated_venv
                firsts_trajs[step + 1] = done_venv
                prev_obs_venv = obs_venv
                cnt_train_step += (
                    self.n_envs * self.act_steps if not eval_mode else 0
                )

            episode_stats = self._episode_stats(firsts_trajs, reward_trajs)
            diag = {}
            if not eval_mode:
                self.update_state, diag = self._jit_update(
                    self.update_state,
                    {k: jnp.asarray(v) for k, v in obs_trajs.items()},
                    jnp.asarray(samples_trajs),
                    jnp.asarray(reward_trajs),
                    jnp.asarray(terminated_trajs),
                    jnp.asarray(firsts_trajs[:-1]),
                    {
                        k: jnp.asarray(prev_obs_venv[k], jnp.float32)
                        for k in self.obs_dims
                    },
                    self.next_rng(),
                    jnp.asarray(self.itr, dtype=jnp.int32),
                )
                diag = {k: float(v) for k, v in diag.items()}

            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self.update_state.params)
            self._log_iteration(
                eval_mode, episode_stats, diag, cnt_train_step, timer
            )
            self.itr += 1

