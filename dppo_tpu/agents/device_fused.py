"""Shared fused-iteration loop for TPU-resident envs.

No reference counterpart — the closest is the GPU-batched IsaacGym loop
(`agent/finetune/train_ppo_diffusion_agent.py` driving
`FurnitureRLSimEnvMultiStepWrapper`, `env/gym_utils/wrapper/furniture.py:47`),
which still crosses host↔device on every macro-step. Here the env IS a JAX
program (`envs/device/`), so one training iteration — the n_steps rollout
(policy sampling + batched env chunk-step per macro-step) AND the full PPO
update — compiles into a SINGLE XLA program: zero host↔device crossings
inside an iteration, one dispatch per iteration.

`DeviceFusedMixin` holds everything policy-family-agnostic: cfg validation,
program building, the rollout scan, and the run() loop. A concrete agent
mixes it into its host PPO agent class and implements `_device_sample`
(what to feed the env and what to store for the update — the denoising
chain for DPPO, the action chunk for Gaussian/GMM PPO). The host agent's
`_update` is reused unchanged: its signature
(update_state, obs, record, reward, terminated, firsts, final_obs, rng, itr)
is shared across the PPO family.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.profiling import PhaseTimer
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class DeviceFusedMixin:
    """Fused rollout+update iteration over a DeviceVectorEnv pool."""

    # ------------------------------------------------------------ plumbing
    @staticmethod
    def _validate_device_cfg(cfg):
        """Call before super().__init__ so a bad env cfg fails before the
        model (and its pretrained checkpoint) is built."""
        if cfg.env.get("backend") != "device":
            raise ValueError("the fused device agent requires env.backend=device")
        ms = (cfg.env.get("wrappers") or {}).get("multi_step") or {}
        if not ms.get("reset_within_step", False):
            raise ValueError(
                "the fused device rollout requires "
                "env.wrappers.multi_step.reset_within_step=true (episodes "
                "must restart inside the scan)"
            )

    def _init_device_backend(self):
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self._build_device_programs()

    def _build_device_programs(self):
        """(Re)build the jitted iteration programs. Concrete agents call
        this again whenever static sampler config changes (e.g. a DPPO
        ft-window promote re-bakes the chain shape)."""
        self._jit_iteration = jax.jit(
            lambda u, p, f, r, i: self._rollout(u, p, f, r, i, train=True)
        )
        self._jit_rollout_eval = jax.jit(
            lambda u, p, f, r, i: self._rollout(u, p, f, r, i, train=False)
        )

    # -------------------------------------------------------------- hooks
    def _device_sample(self, params, obs, rng, train):
        """One policy query inside the rollout scan.

        Returns (actions (E, Ta, Da) — the full sampled chunk, of which the
        first act_steps are executed — and the per-step record stored for
        `_update`: the denoising chain for DPPO, the action chunk itself
        for Gaussian/GMM PPO)."""
        raise NotImplementedError

    def _device_obs(self, hist):
        """Policy observation dict from the pool's obs history. Tasks with
        a `split_obs` (on-device pixel rendering) expose their modalities;
        everything else sees the plain state history."""
        task = self.pool.task
        if hasattr(task, "split_obs"):
            return task.split_obs(hist)
        return {"state": hist}

    def _maybe_promote(self):
        """Post-iteration model annealing hook (DPPO ft-window promote).
        Default: nothing."""

    def _save_device_checkpoint(self):
        self.save_model(self.update_state.params)

    # ------------------------------------------------------------- rollout
    def _rollout(self, update_state, pool_state, first0, rng, itr, train: bool):
        """One full iteration on device. train=True also runs `_update`.
        first0 (E,): 1 where step 0 starts a fresh episode — all-ones after
        a reset, the previous iteration's dones when episodes carry over
        (host loop parity: firsts_trajs[0] = done_venv)."""
        act_steps = self.act_steps

        def macro_step(carry, step_rng):
            pool_state = carry
            obs = self._device_obs(pool_state.hist)  # {key: (E, To, ...)}
            actions, record = self._device_sample(
                update_state.params, obs, step_rng, train
            )
            pool_state, out = self.pool.step_chunk(
                pool_state, actions[:, :act_steps]
            )
            done = out.terminated | out.truncated
            ys = (
                obs,
                record,
                out.reward,
                out.terminated.astype(jnp.float32),
                done.astype(jnp.float32),
            )
            return pool_state, ys

        rng, roll_rng = jax.random.split(rng)
        step_rngs = jax.random.split(roll_rng, self.n_steps)
        pool_state, (obs_trajs, record_trajs, reward_trajs, term_trajs, done_trajs) = (
            jax.lax.scan(macro_step, pool_state, step_rngs)
        )

        if not train:
            return pool_state, reward_trajs, done_trajs

        # firsts for steps 0..S-1: episodes restart inside the pool, so step
        # i>0 starts fresh iff step i-1 ended done (host loop parity:
        # firsts_trajs[step + 1] = done_venv)
        firsts = jnp.concatenate(
            [first0[None].astype(jnp.float32), done_trajs[:-1]], axis=0
        )
        final_obs = self._device_obs(pool_state.hist)
        new_update_state, diag = self._update(
            update_state,
            obs_trajs,
            record_trajs,
            reward_trajs,
            term_trajs,
            firsts,
            final_obs,
            rng,
            itr,
        )
        return (
            new_update_state,
            pool_state,
            reward_trajs,
            done_trajs,
            diag,
        )

    # ------------------------------------------------------------------
    def run(self):
        timer = Timer()
        phase_timer = PhaseTimer()
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
                self.venv.reset_arg()  # jitted pool reset (advances seeds)
                pool_state = self.venv.pool_state
                first0 = np.ones(self.n_envs)
            else:
                first0 = np.asarray(last_done, dtype=np.float64)
            last_itr_eval = eval_mode

            first0_dev = jnp.asarray(first0, jnp.float32)
            if eval_mode:
                with phase_timer.phase("sample"):
                    pool_state, reward_trajs, done_trajs = jax.block_until_ready(
                        self._jit_rollout_eval(
                            self.update_state,
                            pool_state,
                            first0_dev,
                            self.next_rng(),
                            jnp.asarray(self.itr, jnp.int32),
                        )
                    )
                diag = {}
            else:
                with phase_timer.phase("update"):
                    (
                        self.update_state,
                        pool_state,
                        reward_trajs,
                        done_trajs,
                        diag,
                    ) = jax.block_until_ready(
                        self._jit_iteration(
                            self.update_state,
                            pool_state,
                            first0_dev,
                            self.next_rng(),
                            jnp.asarray(self.itr, jnp.int32),
                        )
                    )
                diag = {k: float(v) for k, v in diag.items()}
                cnt_train_step += self.n_steps * self.n_envs * self.act_steps
            self.venv.pool_state = pool_state

            reward_trajs = np.asarray(reward_trajs)
            done_trajs = np.asarray(done_trajs)
            last_done = done_trajs[-1]
            firsts_trajs = np.concatenate(
                [first0[None], done_trajs], axis=0
            )  # (S+1, E)
            episode_stats = self._episode_stats(firsts_trajs, reward_trajs)

            if not eval_mode:
                times = phase_timer.summary()
                iter_wall = times.get("time/update", 0.0)
                if iter_wall > 0:
                    diag["env_steps_per_s"] = (
                        self.n_steps * self.n_envs * self.act_steps / iter_wall
                    )
                diag.update(times)

            self._maybe_promote()

            if (
                self.itr % self.save_model_freq == 0
                or self.itr == self.n_train_itr - 1
            ):
                self._save_device_checkpoint()

            self._log_iteration(
                eval_mode, episode_stats, diag, cnt_train_step, timer
            )
            self.itr += 1
