"""Cal-QL fine-tuning (parity: `agent/finetune/train_calql_agent.py`, 503
LoC): offline phase sampling only the offline dataset (with Monte-Carlo
reward-to-go, `:31, :119-125`), online phase mixing offline + online batches
50/50 (`:384-391`), uniform random actions for the CQL penalty (`:395-406`),
SAC-style actor/temperature updates, Polyak target critic.

Online episodes' reward-to-go is computed per completed episode (`:258-276`)
and stored alongside transitions: transitions pend in per-env lists until
their episode finishes (terminated or truncated), at which point the
episode's discounted Monte-Carlo return-to-go is computed backward and the
whole episode is inserted into replay. Episodes interrupted by an env reset
(eval, reset_at_iteration) are flushed as if truncated — the reference
instead silently drops their returns (`:272` only extends completed
episodes), so keeping the truncated-MC tail is a strictly-more-data
deviation."""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dppo_tpu.agents.finetune_sac import SACTrainState, TrainSACAgent
from dppo_tpu.config import instantiate
from dppo_tpu.utils.replay import (
    ReplayState,
    replay_init,
    replay_insert,
    replay_insert_masked,
    replay_sample_indices,
)

log = logging.getLogger(__name__)


class TrainCalQLAgent(TrainSACAgent):
    def __init__(self, cfg):
        self.train_online = bool(cfg.train.train_online)
        self.n_random_actions = int(cfg.train.n_random_actions)
        self.num_update = int(cfg.train.num_update)
        self._offline_cfg = cfg.offline_dataset
        super().__init__(cfg)
        ds = instantiate(self._offline_cfg)
        batch = ds.get_batch(jnp.arange(len(ds), dtype=jnp.int32))
        self.offline = {
            "obs": batch.conditions["state"],
            "next_obs": batch.conditions["next_state"],
            "actions": batch.actions[:, : self.act_steps],
            "rewards": batch.rewards.reshape(-1),
            "terminated": batch.dones.reshape(-1),
            "reward_to_go": batch.reward_to_gos.reshape(-1),
        }
        self.n_offline = int(self.offline["rewards"].shape[0])
        # online replay additionally stores reward-to-go
        self.replay = replay_init(
            self.buffer_size,
            {
                "obs": np.zeros((self.n_cond_step, self.obs_dim), np.float32),
                "next_obs": np.zeros(
                    (self.n_cond_step, self.obs_dim), np.float32
                ),
                "actions": np.zeros(
                    (self.act_steps, self.action_dim), np.float32
                ),
                "rewards": np.zeros((), np.float32),
                "terminated": np.zeros((), np.float32),
                "reward_to_go": np.zeros((), np.float32),
            },
        )
        # per-env transitions awaiting their episode's MC reward-to-go
        self._pending: list[list[dict]] = [[] for _ in range(self.n_envs)]
        # episodes flush as FIXED-shape masked inserts (capacity = the
        # episode's macro-step budget) so interrupted flushes and early
        # terminations reuse ONE compiled insert instead of tracing a fresh
        # program per distinct episode length (advisor r3)
        self._ep_cap = max(
            1, -(-int(self.max_episode_steps) // self.act_steps)
        )
        self._jit_insert_masked = jax.jit(replay_insert_masked)
        self._jit_update = jax.jit(
            self._calql_update, static_argnames=("use_online",)
        )

    def _init_model_params(self, cond, example_action, init_temperature):
        return self.model.init_calql_params(
            self.next_rng(), cond, example_action, init_temperature
        )

    # transitions pend per env until their episode ends, so the stored
    # reward-to-go is the episode's Monte-Carlo return (reference parity:
    # train_calql_agent.py:258-276 computes returns per completed episode)
    def _insert_transitions(
        self, prev_obs_venv, action_venv, obs_venv, reward_venv,
        terminated_venv, truncated_venv, info_venv,
    ):
        next_state = obs_venv["state"].copy()
        for i in range(self.n_envs):
            if truncated_venv[i] and "final_obs" in info_venv[i]:
                next_state[i] = info_venv[i]["final_obs"]["state"]
        for i in range(self.n_envs):
            self._pending[i].append(
                {
                    "obs": prev_obs_venv["state"][i].copy(),
                    "next_obs": next_state[i],
                    "actions": action_venv[i].copy(),
                    "rewards": np.float32(
                        reward_venv[i] * self.scale_reward_factor
                    ),
                    "terminated": np.float32(terminated_venv[i]),
                }
            )
            if terminated_venv[i] or truncated_venv[i]:
                self._flush_env(i)

    def _flush_env(self, i: int):
        """Insert env i's pending episode with backward discounted MC
        reward-to-go."""
        ep = self._pending[i]
        if not ep:
            return
        T = len(ep)
        rewards = np.array([p["rewards"] for p in ep], np.float32)
        terminated = np.array([p["terminated"] for p in ep], np.float32)
        rtg = np.zeros(T, np.float32)
        acc = np.float32(0.0)
        for t in range(T - 1, -1, -1):
            acc = rewards[t] + self.gamma * acc * (1.0 - terminated[t])
            rtg[t] = acc
        # fixed-shape masked insert: one compiled program for every episode
        # length (see __init__)
        C = self._ep_cap
        assert T <= C, f"episode of {T} macro-steps exceeds budget {C}"

        def pad(x):
            out = np.zeros((C,) + x.shape[1:], np.float32)
            out[:T] = x
            return jnp.asarray(out)

        mask = np.zeros((C,), bool)
        mask[:T] = True
        self.replay = self._jit_insert_masked(
            self.replay,
            {
                "obs": pad(np.stack([p["obs"] for p in ep])),
                "next_obs": pad(np.stack([p["next_obs"] for p in ep])),
                "actions": pad(np.stack([p["actions"] for p in ep])),
                "rewards": pad(rewards),
                "terminated": pad(terminated),
                "reward_to_go": pad(rtg),
            },
            jnp.asarray(mask),
        )
        self._pending[i] = []

    def _flush_pending(self):
        """Flush every env's pending (interrupted) episode as if truncated.
        Called when envs are about to reset mid-episode (eval,
        reset_at_iteration); completed episodes flush on their done flag."""
        if not hasattr(self, "_pending"):  # reset during __init__
            return
        for i in range(self.n_envs):
            self._flush_env(i)

    def reset_env_all(self, verbose: bool = False, options_venv=None, **kwargs):
        self._flush_pending()
        return super().reset_env_all(
            verbose=verbose, options_venv=options_venv, **kwargs
        )

    def _mixed_batch(self, rng, replay: ReplayState, use_online):
        r_off, r_on = jax.random.split(rng)
        half = self.batch_size // 2 if use_online else self.batch_size
        inds_off = jax.random.randint(r_off, (half,), 0, self.n_offline)
        batch = {k: self.offline[k][inds_off] for k in self.offline}
        if use_online:
            inds_on = replay_sample_indices(r_on, replay, self.batch_size // 2)
            batch = {
                k: jnp.concatenate(
                    [batch[k], replay.data[k][inds_on]], axis=0
                )
                for k in batch
            }
        return batch

    def _calql_update(self, state: SACTrainState, replay: ReplayState, rng,
                      use_online):
        model = self.model

        def one(carry, sub):
            state = carry
            r_batch, r_rand, r_critic, r_actor, r_alpha = jax.random.split(
                sub, 5
            )
            batch = self._mixed_batch(r_batch, replay, use_online)
            B = batch["rewards"].shape[0]
            obs_b = {"state": batch["obs"]}
            next_obs_b = {"state": batch["next_obs"]}
            random_actions = (
                jax.random.uniform(
                    r_rand,
                    (
                        B,
                        self.n_random_actions,
                        self.act_steps,
                        self.action_dim,
                    ),
                )
                * 2.0
                - 1.0
            )
            loss_critic, grads = jax.value_and_grad(model.loss_critic)(
                state.params.critic, state.params, obs_b, next_obs_b,
                batch["actions"], random_actions, batch["rewards"],
                batch["reward_to_go"], batch["terminated"], self.gamma,
                r_critic,
            )
            updates, critic_opt = self.critic_optimizer.update(
                grads, state.critic_opt, state.params.critic
            )
            params = state.params._replace(
                critic=optax.apply_updates(state.params.critic, updates)
            )
            params = model.update_target_critic(params, self.target_ema_rate)

            alpha = jnp.exp(params.log_alpha)
            loss_actor, a_grads = jax.value_and_grad(model.loss_actor)(
                params.actor, params, obs_b, alpha, r_actor
            )
            a_updates, actor_opt = self.actor_optimizer.update(
                a_grads, state.actor_opt, params.actor
            )
            params = params._replace(
                actor=optax.apply_updates(params.actor, a_updates)
            )
            loss_alpha, al_grads = jax.value_and_grad(model.loss_temperature)(
                params.log_alpha, params, obs_b, self.target_entropy, r_alpha
            )
            al_updates, alpha_opt = self.alpha_optimizer.update(
                al_grads, state.alpha_opt, params.log_alpha
            )
            params = params._replace(
                log_alpha=optax.apply_updates(params.log_alpha, al_updates)
            )
            return (
                state._replace(
                    params=params,
                    actor_opt=actor_opt,
                    critic_opt=critic_opt,
                    alpha_opt=alpha_opt,
                ),
                jnp.stack([loss_critic, loss_actor]),
            )

        state, losses = jax.lax.scan(
            one, state, jax.random.split(rng, self.num_update)
        )
        return state, losses.mean(0)

    def _should_update(self):
        if not self.train_online:
            return True
        return self.itr > self.n_explore_steps

    def _do_updates(self) -> dict:
        # NOTE: no blanket flush here — transitions enter replay only when
        # their episode completes (reference parity: per-episode MC returns)
        use_online = self.train_online and int(self.replay.size) > 0
        self.state, losses = self._jit_update(
            self.state, self.replay, self.next_rng(), use_online=use_online
        )
        return {
            "loss_critic": float(losses[0]),
            "loss_actor": float(losses[1]),
            "alpha": float(jnp.exp(self.state.params.log_alpha)),
        }
