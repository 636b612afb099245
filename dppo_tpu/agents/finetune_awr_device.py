"""AWR diffusion fine-tuning with a TPU-resident env (fused iteration).

The host loop (`finetune_awr_diffusion.py`, parity with the reference's
`train_awr_diffusion_agent.py`) keeps a FIFO window of the most recent
`buffer_size` macro-steps ACROSS iterations (host deques) and runs TD(λ) +
weighted-regression updates over it. On a device env the window becomes a
device-resident fixed-capacity array pytree (`AWRWindow`) threaded through
the jitted iteration, so one dispatch = rollout scan + window shift-insert +
the full AWR update:

- the window is time-ordered with the newest rows at the END (a static
  `concat(buf[n_steps:], new)` shift — FIFO without ring-index gymnastics,
  and the TD(λ) backward scan runs over it directly);
- before the window fills, the front rows are zero padding; `_update`'s
  `n_valid_steps` restricts minibatch index draws to the valid tail (TD
  targets of valid rows never read padded rows — they only look forward);
- one deviation from the host path while filling: the minibatch size stays
  at the static `batch_size` even when fewer than `batch_size` valid rows
  exist (draws repeat), whereas the host shrinks the batch. After
  `buffer_size / (n_steps·n_envs)` iterations the two paths sample the
  same population.

Eval iterations roll out deterministically and do not touch the window
(host parity: buffering is skipped in eval mode).
"""

from __future__ import annotations

import logging
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_awr_diffusion import TrainAWRDiffusionAgent
from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class AWRWindow(NamedTuple):
    """Fixed-capacity FIFO of macro-steps, newest rows last."""

    obs: Any  # (Sb, E, To, Do)
    actions: Any  # (Sb, E, Ta, Da)
    rewards: Any  # (Sb, E)  — already reward-scaled
    terminated: Any  # (Sb, E)
    filled: Any  # int32 scalar, number of valid rows (<= Sb)


class TrainAWRDiffusionDeviceAgent(TrainAWRDiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self.max_buffer_steps = max(1, self.buffer_size // self.n_envs)
        Sb, E = self.max_buffer_steps, self.n_envs
        To, Do = int(cfg.cond_steps), int(cfg.obs_dim)
        Ta, Da = int(cfg.horizon_steps), int(cfg.action_dim)
        self.window = AWRWindow(
            obs=jnp.zeros((Sb, E, To, Do), jnp.float32),
            actions=jnp.zeros((Sb, E, Ta, Da), jnp.float32),
            rewards=jnp.zeros((Sb, E), jnp.float32),
            terminated=jnp.zeros((Sb, E), jnp.float32),
            filled=jnp.asarray(0, jnp.int32),
        )
        self._jit_iteration = jax.jit(
            lambda s, w, p, r, i: self._fused_iteration(s, w, p, r, i, True)
        )
        self._jit_rollout_eval = jax.jit(
            lambda s, p, r: self._fused_iteration(s, None, p, r, None, False)
        )

    # ------------------------------------------------------------- window
    def _window_insert(self, w: AWRWindow, obs, actions, rewards, terminated):
        S, Sb = self.n_steps, self.max_buffer_steps
        if S >= Sb:
            new = AWRWindow(
                obs[-Sb:], actions[-Sb:], rewards[-Sb:], terminated[-Sb:],
                w.filled,
            )
        else:
            cat = lambda old, add: jnp.concatenate([old[S:], add], axis=0)
            new = AWRWindow(
                cat(w.obs, obs),
                cat(w.actions, actions),
                cat(w.rewards, rewards),
                cat(w.terminated, terminated),
                w.filled,
            )
        return new._replace(
            filled=jnp.minimum(w.filled + S, Sb).astype(jnp.int32)
        )

    # ---------------------------------------------------------- iteration
    def _fused_iteration(self, state, window, pool_state, rng, itr, train):
        act_steps = self.act_steps

        def macro_step(carry, step_rng):
            pool_state = carry
            cond = {"state": pool_state.hist}
            samples = self.model.forward(
                state.params.actor, cond, step_rng, deterministic=not train
            )
            pool_state, out = self.pool.step_chunk(
                pool_state, samples[:, :act_steps]
            )
            done = out.terminated | out.truncated
            return pool_state, (
                cond["state"],
                samples,
                out.reward,
                out.terminated.astype(jnp.float32),
                done.astype(jnp.float32),
            )

        rng, roll_rng = jax.random.split(rng)
        step_rngs = jax.random.split(roll_rng, self.n_steps)
        pool_state, (obs_t, samp_t, rew_t, term_t, done_t) = jax.lax.scan(
            macro_step, pool_state, step_rngs
        )
        if not train:
            return pool_state, rew_t, done_t

        window = self._window_insert(
            window, obs_t, samp_t, rew_t * self.scale_reward_factor, term_t
        )
        state, loss_actor, loss_critic = self._update(
            state,
            window.obs,
            window.actions,
            window.rewards,
            window.terminated,
            rng,
            itr,
            n_valid_steps=window.filled,
        )
        return (
            state,
            window,
            pool_state,
            rew_t,
            done_t,
            (loss_actor, loss_critic),
        )

    # ---------------------------------------------------------------- run
    def run(self):
        timer = Timer()
        cnt_train_step = 0
        pool_state = None
        last_done = None
        last_itr_eval = False
        while self.itr < self.n_train_itr:
            eval_mode = self.itr % self.val_freq == 0 and not self.force_train
            fresh = (
                pool_state is None
                or self.reset_at_iteration
                or eval_mode
                or last_itr_eval
            )
            if fresh:
                self.venv.reset_arg()
                pool_state = self.venv.pool_state
                first0 = np.ones(self.n_envs)
            else:
                first0 = np.asarray(last_done, dtype=np.float64)
            last_itr_eval = eval_mode

            diag = {}
            wall = Timer()
            if eval_mode:
                pool_state, reward_trajs, done_trajs = jax.block_until_ready(
                    self._jit_rollout_eval(
                        self.state, pool_state, self.next_rng()
                    )
                )
            else:
                (
                    self.state,
                    self.window,
                    pool_state,
                    reward_trajs,
                    done_trajs,
                    losses,
                ) = jax.block_until_ready(
                    self._jit_iteration(
                        self.state,
                        self.window,
                        pool_state,
                        self.next_rng(),
                        jnp.asarray(self.itr, jnp.int32),
                    )
                )
                diag = {
                    "loss_actor": float(losses[0]),
                    "loss_critic": float(losses[1]),
                }
                cnt_train_step += self.n_steps * self.n_envs * self.act_steps
                diag["env_steps_per_s"] = (
                    self.n_steps * self.n_envs * self.act_steps
                    / max(wall(), 1e-9)
                )
            self.venv.pool_state = pool_state

            reward_trajs = np.asarray(reward_trajs)
            done_trajs = np.asarray(done_trajs)
            last_done = done_trajs[-1]
            firsts_trajs = np.concatenate([first0[None], done_trajs], axis=0)
            stats = self._episode_stats(firsts_trajs, reward_trajs)

            if (
                self.itr % self.save_model_freq == 0
                or self.itr == self.n_train_itr - 1
            ):
                self.save_model(self.state.params)
            self._log_iteration(eval_mode, stats, diag, cnt_train_step, timer)
            self.itr += 1
