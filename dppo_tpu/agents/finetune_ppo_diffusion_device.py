"""DPPO fine-tuning with a TPU-resident env: the fully fused iteration.

No reference counterpart — the closest is the GPU-batched IsaacGym loop
(`agent/finetune/train_ppo_diffusion_agent.py` driving
`FurnitureRLSimEnvMultiStepWrapper`), which still crosses host↔device every
macro-step. Here the env IS a JAX program (`envs/device/`), so one training
iteration — the n_steps rollout (K-step denoising scan + batched env chunk
step per macro-step) AND the full PPO update — compiles into a SINGLE XLA
program: zero host↔device crossings inside an iteration, one dispatch per
iteration.

Requires `env.backend=device` (a DeviceVectorEnv); everything else (model,
update math, logging, checkpoints, promote annealing) is inherited from
TrainPPODiffusionAgent. Episode accounting runs host-side on the small
(S, E) reward/firsts arrays fetched once per iteration.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent
from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.profiling import PhaseTimer
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class TrainPPODiffusionDeviceAgent(TrainPPODiffusionAgent):
    def __init__(self, cfg):
        # validate the env config up front (before the base class builds the
        # model and loads the pretrained checkpoint)
        if cfg.env.get("backend") != "device":
            raise ValueError(
                "TrainPPODiffusionDeviceAgent requires env.backend=device"
            )
        ms = (cfg.env.get("wrappers") or {}).get("multi_step") or {}
        if not ms.get("reset_within_step", False):
            raise ValueError(
                "the fused device rollout requires "
                "env.wrappers.multi_step.reset_within_step=true (episodes "
                "must restart inside the scan)"
            )
        super().__init__(cfg)
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self._build_device_programs()

    # ------------------------------------------------------------------
    def _build_device_programs(self):
        """(Re)build the jitted iteration programs. Called again after a
        ft-window promote (chain shape is baked in at trace time)."""
        self._jit_iteration = jax.jit(partial(self._rollout, train=True))
        self._jit_rollout_eval = jax.jit(partial(self._rollout, train=False))

    def _rollout(self, update_state, pool_state, rng, itr, train: bool):
        """One full iteration on device. train=True also runs `_update`."""
        model = self.model
        act_steps = self.act_steps

        def macro_step(carry, step_rng):
            pool_state = carry
            obs = {"state": pool_state.hist}  # (E, To, Do)
            samples = model.sample(
                update_state.params,
                obs,
                step_rng,
                deterministic=not train,
                return_chain=True,
            )
            actions = samples.trajectories[:, :act_steps]
            pool_state, out = self.pool.step_chunk(pool_state, actions)
            done = out.terminated | out.truncated
            ys = (
                obs["state"],
                samples.chains,
                out.reward,
                out.terminated.astype(jnp.float32),
                done.astype(jnp.float32),
            )
            return pool_state, ys

        rng, roll_rng = jax.random.split(rng)
        step_rngs = jax.random.split(roll_rng, self.n_steps)
        pool_state, (obs_trajs, chains_trajs, reward_trajs, term_trajs, done_trajs) = (
            jax.lax.scan(macro_step, pool_state, step_rngs)
        )

        if not train:
            return pool_state, reward_trajs, done_trajs

        # firsts for steps 0..S-1: episodes restart inside the pool, so step
        # i>0 starts fresh iff step i-1 ended done (host loop parity:
        # firsts_trajs[step + 1] = done_venv)
        firsts = jnp.concatenate(
            [jnp.ones((1, self.n_envs)), done_trajs[:-1]], axis=0
        )
        final_obs = {"state": pool_state.hist}
        new_update_state, diag = self._update(
            update_state,
            {"state": obs_trajs},
            chains_trajs,
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

            if eval_mode:
                with phase_timer.phase("sample"):
                    pool_state, reward_trajs, done_trajs = jax.block_until_ready(
                        self._jit_rollout_eval(
                            self.update_state,
                            pool_state,
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

            promote = self.model.step()
            if promote:
                p = self.update_state.params
                self.update_state = self.update_state._replace(
                    params=p._replace(
                        actor=jax.tree_util.tree_map(jnp.copy, p.actor_ft)
                    )
                )
                self.K_ft = self.model.ft_denoising_steps
                self._build_sampler()
                self._build_device_programs()

            if (
                self.itr % self.save_model_freq == 0
                or self.itr == self.n_train_itr - 1
            ):
                self.save_model(self.update_state.params)
                self.save_full_state()

            self._log_iteration(
                eval_mode, episode_stats, diag, cnt_train_step, timer
            )
            self.itr += 1
