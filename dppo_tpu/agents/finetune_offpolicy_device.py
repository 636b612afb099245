"""Off-policy diffusion fine-tuning with a TPU-resident env (fused).

The host off-policy diffusion loops (`agents/offpolicy_base.py`, parity with
the reference's `train_{dql,dipo,idql,qsm}_diffusion_agent.py`) run n_steps
env steps (inserting each transition into the device-resident replay ring)
and then `replay_ratio`-scaled minibatch updates — with one host↔device
round trip per env step. With `env.backend=device` everything in that
iteration is already a pure JAX function, so `OffPolicyDeviceMixin` compiles
the WHOLE iteration — rollout scan (policy sampling + batched env chunk step
+ replay insert per macro-step) plus the agent's own `_update` (the same
pure function the host path jits) — into ONE XLA dispatch.

One thin subclass per algorithm pins the sampling semantics (all four reuse
the host agent's `_jit_sample` — jitted functions inline under the outer
jit): DQL/DIPO/QSM sample stochastically in train and deterministically in
eval; IDQL's eval determinism is config-gated (`eval_deterministic`). DIPO's
`_update` additionally writes its action-gradient-improved actions back
into the replay ring, so the update hook threads the replay state through.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_dipo_diffusion import TrainDIPODiffusionAgent
from dppo_tpu.agents.finetune_dql_diffusion import TrainDQLDiffusionAgent
from dppo_tpu.agents.finetune_idql_diffusion import TrainIDQLDiffusionAgent
from dppo_tpu.agents.finetune_qsm_diffusion import TrainQSMDiffusionAgent
from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.replay import replay_insert
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class OffPolicyDeviceMixin:
    """Fused (rollout + replay insert + update) iteration over a DevicePool.

    Mix into a TrainOffPolicyDiffusionAgent subclass; uses its `_update`
    (pure), `_jit_sample`, `state`, `replay`, and `_params_to_save`.
    """

    def _init_device_backend(self):
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self._jit_iteration = jax.jit(
            lambda s, rp, ps, r, i: self._fused_iteration(
                s, rp, ps, r, i, train=True
            )
        )
        self._jit_rollout_eval = jax.jit(
            lambda s, ps, r: self._fused_iteration(
                s, None, ps, r, None, train=False
            )
        )

    # -------------------------------------------------------------- hooks
    def _device_sample(self, params, cond, rng, train):
        """Default sampling semantics: stochastic in train, deterministic
        in eval (host parity: `_sample_action(cond, eval_mode)`)."""
        return self._jit_sample(params, cond, rng, not train)

    def _device_update(self, state, replay, rng, itr):
        """(state, replay, losses). Default: `_update` leaves replay as-is."""
        state, losses = self._update(state, replay, rng, itr)
        return state, replay, losses

    # ---------------------------------------------------------- iteration
    def _fused_iteration(self, state, replay, pool_state, rng, itr, train):
        act_steps = self.act_steps

        def macro_step(carry, step_rng):
            replay, pool_state = carry
            cond = {"state": pool_state.hist}
            actions = self._device_sample(
                state.params, cond, step_rng, train
            )[:, :act_steps]
            pool_state, out = self.pool.step_chunk(pool_state, actions)
            if train:
                next_state = jnp.where(
                    out.truncated[:, None, None], out.final_obs, out.obs
                )
                replay = replay_insert(
                    replay,
                    {
                        "obs": cond["state"],
                        "next_obs": next_state,
                        "actions": actions,
                        "rewards": out.reward * self.scale_reward_factor,
                        "terminated": out.terminated.astype(jnp.float32),
                    },
                )
            done = out.terminated | out.truncated
            return (replay, pool_state), (
                out.reward,
                done.astype(jnp.float32),
            )

        rng, roll_rng = jax.random.split(rng)
        step_rngs = jax.random.split(roll_rng, self.n_steps)
        (replay, pool_state), (reward_trajs, done_trajs) = jax.lax.scan(
            macro_step, (replay, pool_state), step_rngs
        )
        if not train:
            return pool_state, reward_trajs, done_trajs
        state, replay, losses = self._device_update(state, replay, rng, itr)
        return state, replay, pool_state, reward_trajs, done_trajs, losses

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
                    self.replay,
                    pool_state,
                    reward_trajs,
                    done_trajs,
                    losses,
                ) = jax.block_until_ready(
                    self._jit_iteration(
                        self.state,
                        self.replay,
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
                self.save_model(self._params_to_save())
            self._log_iteration(eval_mode, stats, diag, cnt_train_step, timer)
            self.itr += 1


class TrainDQLDiffusionDeviceAgent(OffPolicyDeviceMixin, TrainDQLDiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()


class TrainDIPODiffusionDeviceAgent(OffPolicyDeviceMixin, TrainDIPODiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()

    def _device_update(self, state, replay, rng, itr):
        # DIPO writes action-gradient-improved actions back into the ring
        return self._update(state, replay, rng, itr)


class TrainIDQLDiffusionDeviceAgent(OffPolicyDeviceMixin, TrainIDQLDiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()

    def _device_sample(self, params, cond, rng, train):
        det = (not train) and self.eval_deterministic
        return self._jit_sample(params, cond, rng, det)


class TrainQSMDiffusionDeviceAgent(OffPolicyDeviceMixin, TrainQSMDiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        self._init_device_backend()
