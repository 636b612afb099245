"""DPPO fine-tuning — the flagship training loop.

Capability parity with `agent/finetune/train_ppo_diffusion_agent.py:21`
(TrainPPODiffusionAgent): rollout storing denoising chains, value +
old-logprob recompute, running reward scaling, GAE, minibatched PPO updates
with a flat index unravelled over (env-step, denoise-step), optional
learnable-η optimizer, target-KL early stop, explained-variance diagnostics,
per-iteration wandb/result.pkl logging.

TPU-first structure (the performance story):

* Rollout: ONE jitted sampler call per env macro-step runs the full K-step
  denoising scan on device; the host only moves a (n_envs, obs) array in and
  a (n_envs, act_steps, Da) array out. (The reference pays a Python loop
  over K with a fresh CUDA launch + `.cpu()` sync per step.)
* Everything after the rollout — critic values, old logprobs over all
  (step × env × K_ft) transitions, reward scaling, GAE, all PPO epochs with
  shuffled minibatches, optimizer updates, KL early-stop — is ONE jitted
  program (`_update`). The reference crosses host↔device thousands of times
  per iteration; we cross twice.
* The reference's ragged mid-epoch KL break becomes a masked scan: the
  minibatch that first exceeds target-KL still applies (reference order:
  update, then check, `:364-383`), later minibatches are no-ops via
  `lax.cond`.
* The critic-warmup gate on actor updates (`:365-370`) is a `lax.cond` on
  the iteration index.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_base import TrainPPOAgent, make_optimizer, set_lr
from dppo_tpu.utils.chunk import chunked_apply
from dppo_tpu.utils.profiling import PhaseTimer
from dppo_tpu.utils.reward_scaling import RewardScalerState, scale_rewards
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class UpdateState(NamedTuple):
    params: Any  # VPGParams
    actor_opt: Any
    critic_opt: Any
    eta_opt: Any
    reward_scaler: RewardScalerState


class TrainPPODiffusionAgent(TrainPPOAgent):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.reward_horizon = int(cfg.get("reward_horizon", self.act_steps))
        # observation spec: state-only by default; img/vis subclasses widen
        self.obs_dims = self._build_obs_dims()
        self.learn_eta = self.model.learn_eta
        self.eta_optimizer = None
        if self.learn_eta:
            self.eta_update_interval = int(cfg.train.eta_update_interval)
            self.eta_optimizer = make_optimizer(
                float(cfg.train.eta_lr), float(cfg.train.eta_weight_decay)
            )
            e = cfg.train.eta_lr_scheduler
            self.eta_lr = cosine_warmup_restarts(
                float(cfg.train.eta_lr),
                float(e.min_lr),
                int(e.first_cycle_steps),
                int(e.warmup_steps),
            )

        # --- init params and optimizer states ---
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
            eta_opt=(
                self.eta_optimizer.init(params.eta) if self.learn_eta else None
            ),
            reward_scaler=self.reward_scaler_state,
        )

        self.K_ft = self.model.ft_denoising_steps
        # full-state resume (params, optimizers, reward scaler, rng, itr) —
        # strictly beyond the reference's weights-only restart (SURVEY §5.4)
        self.ckpt_format = str(cfg.train.get("ckpt_format", "pickle"))
        resume_itr = cfg.train.get("resume_itr")
        if resume_itr is not None:
            self.resume_full_state(int(resume_itr))
        from dppo_tpu.ops.pallas.fused_chain import normalize_fused_mode

        self._fused_mode = normalize_fused_mode(
            cfg.train.get("fused_sampler", "auto")
        )
        self._example_cond = cond
        self._build_sampler()
        self._jit_update = jax.jit(self._update)

    def _build_sampler(self):
        """(Re)build the jitted rollout sampler. Must be called again after a
        ft-window promote: the sampler bakes `ft_denoising_steps` (and so the
        chain shape) in at trace time, and jit would not retrace on its own
        since the input shapes are unchanged."""
        self._jit_sample = jax.jit(
            lambda p, c, r, det: self.model.sample(
                p, c, r, deterministic=det, return_chain=True
            ),
            static_argnames=("det",),
        )
        if self._fused_mode != "off" and self.model.ft_denoising_steps > 0:
            from dppo_tpu.ops.pallas.fused_chain import auto_fused_sampler

            fused = auto_fused_sampler(
                self.model,
                self.update_state.params,
                self._example_cond,
                mode=self._fused_mode,
            )
            if fused is not None:
                log.info("rollout sampler: fused Pallas chain kernel")
                self._jit_sample = fused

    def _update_call(self, *args):
        """Dispatch the fused update and block so phase timing is real."""
        state, diag = self._jit_update(*args)
        jax.block_until_ready(diag)
        return state, diag

    def _build_obs_dims(self):
        return {"state": (self.n_cond_step, self.obs_dim)}

    # ---- exact resume: the complete training state in one checkpoint ----
    # format per cfg.train.ckpt_format: "pickle" (single file, default) or
    # "orbax" (directory checkpoint via orbax — SURVEY §5.4 TPU plan)
    def save_full_state(self):
        if getattr(self, "ckpt_format", "pickle") == "orbax":
            from dppo_tpu.utils.ckpt import save_train_state

            save_train_state(
                os.path.join(self.checkpoint_dir, "full_state"),
                self.itr,
                self.update_state,
                aux={
                    "itr": self.itr,
                    "rng": jax.random.key_data(self.rng),
                },
            )
            return
        from dppo_tpu.utils.ckpt import save_checkpoint

        path = os.path.join(self.checkpoint_dir, f"full_state_{self.itr}.pkl")
        save_checkpoint(
            path,
            {
                "itr": self.itr,
                "update_state": self.update_state,
                "rng": jax.random.key_data(self.rng),
            },
        )

    def resume_full_state(self, itr: int):
        if getattr(self, "ckpt_format", "pickle") == "orbax":
            from dppo_tpu.utils.ckpt import load_train_state

            state, aux = load_train_state(
                os.path.join(self.checkpoint_dir, "full_state"),
                itr,
                self.update_state,
            )
            self.update_state = jax.tree_util.tree_map(jnp.asarray, state)
            self.itr = int(aux["itr"]) + 1
            self.rng = jax.random.wrap_key_data(jnp.asarray(aux["rng"]))
            log.info("Resumed full train state (orbax, itr %d)", self.itr)
            return
        from dppo_tpu.utils.ckpt import load_checkpoint

        path = os.path.join(self.checkpoint_dir, f"full_state_{itr}.pkl")
        data = load_checkpoint(path)
        self.itr = int(data["itr"]) + 1
        self.update_state = jax.tree_util.tree_map(
            jnp.asarray, data["update_state"]
        )
        self.rng = jax.random.wrap_key_data(jnp.asarray(data["rng"]))
        log.info("Resumed full train state from %s (itr %d)", path, self.itr)

    def _augment_obs(self, obs_trajs: dict, rng) -> dict:
        """Hook: rollout-buffer-level augmentation (img subclass)."""
        return obs_trajs

    # ------------------------------------------------------------------
    # The fused on-device update program
    # ------------------------------------------------------------------
    def _update(
        self,
        state: UpdateState,
        obs_trajs: dict,  # {key: (S, E, To, ...)}
        chains_trajs: jnp.ndarray,  # (S, E, K_ft+1, Ta, Da)
        reward_trajs: jnp.ndarray,  # (S, E)
        terminated_trajs: jnp.ndarray,  # (S, E)
        firsts_trajs: jnp.ndarray,  # (S, E)
        final_obs: dict,  # {key: (E, To, ...)}
        rng: jax.Array,
        itr: jnp.ndarray,  # () int32
    ):
        model = self.model
        S, E = reward_trajs.shape
        K_ft = self.K_ft
        SE = S * E

        rng, aug_rng = jax.random.split(rng)
        obs_trajs = self._augment_obs(obs_trajs, aug_rng)
        obs_flat = {
            k: v.reshape(SE, *v.shape[2:]) for k, v in obs_trajs.items()
        }
        chains_flat = chains_trajs.reshape(SE, *chains_trajs.shape[2:])

        # --- critic values + old logprobs, streamed in logprob_batch_size
        # chunks (reference parity: train_ppo_agent.py:22-25,
        # train_ppo_diffusion_agent.py:202-240) — a lax.scan over chunks
        # bounds peak activation memory at the pixel operating points ---
        def recompute(obs_c, chains_c):
            v = model.critic_value(state.params, obs_c)
            lp = model.get_logprobs(state.params, obs_c, chains_c).reshape(
                -1, K_ft, model.horizon_steps, model.action_dim
            )
            return v, lp

        values_flat, oldlogprobs = chunked_apply(
            recompute, self.logprob_batch_size, obs_flat, chains_flat
        )
        values_trajs = values_flat.reshape(S, E)
        oldlogprobs = jax.lax.stop_gradient(oldlogprobs)

        # --- running reward scaling (parity: train_ppo_agent.py:80-85) ---
        if self.reward_scale_running:
            scaler_state, reward_trajs = scale_rewards(
                state.reward_scaler,
                reward_trajs,
                firsts_trajs,
                gamma=0.99,
            )
        else:
            scaler_state = state.reward_scaler

        # --- GAE backward scan (parity: :249-279) ---
        next_value_last = model.critic_value(state.params, final_obs)  # (E,)

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
        _, advantages_rev = jax.lax.scan(
            gae_step,
            jnp.zeros((E,)),
            (
                reward_trajs[::-1],
                values_trajs[::-1],
                nextvalues[::-1],
                terminated_trajs[::-1],
            ),
        )
        advantages_trajs = advantages_rev[::-1]
        returns_trajs = advantages_trajs + values_trajs

        returns_flat = returns_trajs.reshape(SE)
        advantages_flat = advantages_trajs.reshape(SE)

        # --- PPO epochs as a masked scan over minibatches ---
        total = SE * K_ft
        num_batch = max(1, total // self.batch_size)
        bs = self.batch_size if total >= self.batch_size else total
        actor_lr = self.actor_lr(
            jnp.maximum(itr - self.n_critic_warmup_itr, 0)
        )
        critic_lr = self.critic_lr(itr)
        actor_opt = set_lr(state.actor_opt, actor_lr)
        critic_opt = set_lr(state.critic_opt, critic_lr)
        eta_opt = state.eta_opt
        if self.learn_eta:
            eta_opt = set_lr(eta_opt, self.eta_lr(itr))

        perm_rngs = jax.random.split(rng, self.update_epochs + 1)
        rng = perm_rngs[0]
        perms = jax.vmap(lambda r: jax.random.permutation(r, total))(
            perm_rngs[1:]
        )  # (epochs, total)
        mb_inds = perms[:, : num_batch * bs].reshape(
            self.update_epochs * num_batch, bs
        )
        bc_rngs = jax.random.split(rng, self.update_epochs * num_batch)

        def loss_fn(params, obs_b, cp, cn, di, ret_b, val_b, adv_b, olp_b, bc_rng):
            pg, ent, v, clipfrac, approx_kl, ratio, bc, eta = model.loss(
                params,
                obs_b,
                cp,
                cn,
                di,
                ret_b,
                val_b,
                adv_b,
                olp_b,
                use_bc_loss=self.use_bc_loss,
                reward_horizon=self.reward_horizon,
                bc_rng=bc_rng,
            )
            total_loss = (
                pg
                + ent * self.ent_coef
                + v * self.vf_coef
                + bc * self.bc_loss_coeff
            )
            return total_loss, (pg, ent, v, clipfrac, approx_kl, ratio, bc, eta)

        def minibatch_step(carry, xs):
            params, a_opt, c_opt, e_opt, stop, mb_i = carry
            inds_b, bc_rng = xs
            batch_inds = inds_b // K_ft
            denoise_inds = inds_b % K_ft
            obs_b = {k: v[batch_inds] for k, v in obs_flat.items()}
            cp = chains_flat[batch_inds, denoise_inds]
            cn = chains_flat[batch_inds, denoise_inds + 1]
            olp_b = oldlogprobs[batch_inds, denoise_inds]

            grads, aux = jax.grad(loss_fn, has_aux=True)(
                params,
                obs_b,
                cp,
                cn,
                denoise_inds,
                returns_flat[batch_inds],
                values_flat[batch_inds],
                advantages_flat[batch_inds],
                olp_b,
                bc_rng,
            )
            pg, ent, v, clipfrac, approx_kl, ratio, bc, eta = aux

            def apply(_):
                a_updates, a_state = self.actor_optimizer.update(
                    grads.actor_ft, a_opt, params.actor_ft
                )
                c_updates, c_state = self.critic_optimizer.update(
                    grads.critic, c_opt, params.critic
                )
                # actor only after critic warmup (parity :365-370)
                do_actor = itr >= self.n_critic_warmup_itr
                new_actor_ft = jax.tree_util.tree_map(
                    lambda p, u: jnp.where(do_actor, p + u, p),
                    params.actor_ft,
                    a_updates,
                )
                a_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(do_actor, new, old),
                    a_state,
                    a_opt,
                )
                new_critic = optax.apply_updates(params.critic, c_updates)
                new_eta, e_state = params.eta, e_opt
                if self.learn_eta:
                    do_eta = jnp.logical_and(
                        do_actor, mb_i % self.eta_update_interval == 0
                    )
                    e_updates, e_state_new = self.eta_optimizer.update(
                        grads.eta, e_opt, params.eta
                    )
                    new_eta = jax.tree_util.tree_map(
                        lambda p, u: jnp.where(do_eta, p + u, p),
                        params.eta,
                        e_updates,
                    )
                    e_state = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(do_eta, new, old),
                        e_state_new,
                        e_opt,
                    )
                return (
                    params._replace(
                        actor_ft=new_actor_ft, critic=new_critic, eta=new_eta
                    ),
                    a_state,
                    c_state,
                    e_state,
                )

            def skip(_):
                return params, a_opt, c_opt, e_opt

            stop_entry = stop
            params, a_opt_n, c_opt_n, e_opt_n = jax.lax.cond(
                stop, skip, apply, operand=None
            )
            # target-KL: the exceeding minibatch still applied; later ones stop
            if self.target_kl is not None:
                stop = jnp.logical_or(stop, approx_kl > self.target_kl)
            metrics = jnp.stack(
                [
                    pg,
                    ent,
                    v,
                    clipfrac,
                    approx_kl,
                    ratio,
                    bc,
                    eta,
                    1.0 - stop_entry.astype(jnp.float32),
                ]
            )
            return (params, a_opt_n, c_opt_n, e_opt_n, stop, mb_i + 1), metrics

        (params, actor_opt, critic_opt, eta_opt, _, _), metrics = jax.lax.scan(
            minibatch_step,
            (
                state.params,
                actor_opt,
                critic_opt,
                eta_opt,
                jnp.asarray(False),
                jnp.asarray(0, dtype=jnp.int32),
            ),
            (mb_inds, bc_rngs),
        )

        # diagnostics: last applied minibatch + means
        applied = metrics[:, 8]
        n_applied = jnp.maximum(applied.sum(), 1.0)
        last_idx = jnp.maximum(applied.sum().astype(jnp.int32) - 1, 0)
        var_y = jnp.var(returns_flat)
        explained_var = jnp.where(
            var_y > 0, 1.0 - jnp.var(returns_flat - values_flat) / var_y, jnp.nan
        )
        diag = {
            # optimization-health diagnostics (round-4 addition): raw
            # (pre-normalization) advantage spread and scaled-return variance
            # expose the "homogeneous behavior -> no learning signal" failure
            # mode that plain pg_loss/approx_kl cannot distinguish from health
            "adv_mean": advantages_flat.mean(),
            "adv_std": advantages_flat.std(),
            "return_var_scaled": var_y,
        }
        diag |= {
            "pg_loss": metrics[last_idx, 0],
            "entropy_loss": metrics[last_idx, 1],
            "v_loss": metrics[last_idx, 2],
            "clipfrac": (metrics[:, 3] * applied).sum() / n_applied,
            "approx_kl": metrics[last_idx, 4],
            "ratio": metrics[last_idx, 5],
            "bc_loss": metrics[last_idx, 6],
            "eta": metrics[last_idx, 7],
            "num_applied_batches": applied.sum(),
            "explained_variance": explained_var,
            "actor_lr": actor_lr,
            "critic_lr": critic_lr,
        }
        new_state = UpdateState(
            params=params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            eta_opt=eta_opt,
            reward_scaler=scaler_state,
        )
        return new_state, diag

    # ------------------------------------------------------------------
    # Host-side rollout loop
    # ------------------------------------------------------------------
    def run(self):
        timer = Timer()
        phase_timer = PhaseTimer()
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
            chains_trajs = np.zeros(
                (
                    self.n_steps,
                    self.n_envs,
                    self.K_ft + 1,
                    self.horizon_steps,
                    self.action_dim,
                ),
                dtype=np.float32,
            )
            reward_trajs = np.zeros((self.n_steps, self.n_envs), dtype=np.float32)
            terminated_trajs = np.zeros(
                (self.n_steps, self.n_envs), dtype=np.float32
            )
            obs_full_trajs = (
                np.empty((0, self.n_envs, self.obs_dim))
                if self.save_full_observations
                else None
            )
            if self.save_full_observations:
                obs_full_trajs = np.vstack(
                    (obs_full_trajs, prev_obs_venv["state"][:, -1][None])
                )

            for step in range(self.n_steps):
                cond = {
                    k: jnp.asarray(prev_obs_venv[k], dtype=jnp.float32)
                    for k in self.obs_dims
                }
                with phase_timer.phase("sample"):
                    samples = self._jit_sample(
                        self.update_state.params, cond, self.next_rng(), eval_mode
                    )
                    output_venv = np.asarray(samples.trajectories)
                action_venv = output_venv[:, : self.act_steps]

                with phase_timer.phase("env"):
                    # dispatch the simulators first, then fetch the chain
                    # (device→host) and fill buffers while they step
                    # (plain step for external venvs without the split API)
                    split = hasattr(self.venv, "step_async")
                    if split:
                        self.venv.step_async(action_venv)
                    chains_venv = np.asarray(samples.chains)
                    for k in self.obs_dims:
                        obs_trajs[k][step] = prev_obs_venv[k]
                    chains_trajs[step] = chains_venv
                    (
                        obs_venv,
                        reward_venv,
                        terminated_venv,
                        truncated_venv,
                        info_venv,
                    ) = (
                        self.venv.step_wait()
                        if split
                        else self.venv.step(action_venv)
                    )
                done_venv = terminated_venv | truncated_venv
                if self.save_full_observations:
                    obs_full_venv = np.array(
                        [info["full_obs"]["state"] for info in info_venv]
                    )
                    obs_full_trajs = np.vstack(
                        (obs_full_trajs, obs_full_venv.transpose(1, 0, 2))
                    )
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
                with phase_timer.phase("update"):
                    self.update_state, diag = self._update_call(
                    self.update_state,
                    {k: jnp.asarray(v) for k, v in obs_trajs.items()},
                    jnp.asarray(chains_trajs),
                    jnp.asarray(reward_trajs),
                    jnp.asarray(terminated_trajs),
                    jnp.asarray(firsts_trajs[:-1]),
                    {
                        k: jnp.asarray(prev_obs_venv[k], dtype=jnp.float32)
                        for k in self.obs_dims
                    },
                    self.next_rng(),
                    jnp.asarray(self.itr, dtype=jnp.int32),
                )
                diag = {k: float(v) for k, v in diag.items()}
                times = phase_timer.summary()
                iter_wall = sum(
                    times.get(f"time/{p}", 0.0) for p in ("sample", "env", "update")
                )
                if iter_wall > 0:
                    diag["env_steps_per_s"] = (
                        self.n_steps * self.n_envs * self.act_steps / iter_wall
                    )
                    diag["denoise_steps_per_s"] = (
                        self.n_steps
                        * self.n_envs
                        * self.model.n_sampling_steps
                        / max(times.get("time/sample", 1e-9), 1e-9)
                    )
                diag.update(times)

            if (
                self.itr % self.render_freq == 0
                and self.n_render > 0
                and self.traj_plotter is not None
            ):
                self.traj_plotter(
                    obs_full_trajs=obs_full_trajs,
                    n_render=self.n_render,
                    max_episode_steps=self.max_episode_steps,
                    render_dir=self.render_dir,
                    itr=self.itr,
                )

            promote = self.model.step()
            if promote:
                # ft window annealed: actor_ft becomes the new frozen base
                p = self.update_state.params
                self.update_state = self.update_state._replace(
                    params=p._replace(
                        actor=jax.tree_util.tree_map(jnp.copy, p.actor_ft)
                    )
                )
                self.K_ft = self.model.ft_denoising_steps
                self._build_sampler()  # chain shape changed; force retrace

            if self.itr % self.save_model_freq == 0 or self.itr == self.n_train_itr - 1:
                self.save_model(self.update_state.params)
                self.save_full_state()

            self._log_iteration(
                eval_mode, episode_stats, diag, cnt_train_step, timer
            )
            self.itr += 1
