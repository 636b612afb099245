"""RWR diffusion fine-tuning with a TPU-resident env (fused iteration).

The host loop (`finetune_rwr_diffusion.py`, parity with the reference's
`train_rwr_diffusion_agent.py`) computes Monte-Carlo returns by splitting
the rollout window into episodes host-side with numpy (ragged lists: only
episodes that BOTH start and close inside the window count, and 1-step
episodes are skipped). On a device env that accounting becomes three
jittable scans over the (S, E) rollout window, so the whole iteration —
rollout, per-episode returns, and the reward-weighted regression update —
is ONE XLA dispatch:

- `first[t] = t == 0 ? first0 : done[t-1]` (episodes restart in-pool);
- started[t]  (fwd scan):  the episode containing t began in-window;
- closes[t]   (rev scan):  the episode containing t ends in-window;
- length[t] = pos[t] + rem[t] + 1 (fwd + rev scans);
- returns[t] (rev scan):  r[t] + gamma * returns[t+1] * (1 - done[t]);
- valid[t] = started & closes & (length >= 2)  — exactly the host rule
  (`finetune_rwr_diffusion.py` run(): segments from the firsts table,
  `if end - start <= 1: continue`).

Golden-tested element-for-element against the host numpy split in
`tests/test_device_env.py`.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_rwr_diffusion import TrainRWRDiffusionAgent
from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


def episode_returns_and_valid(rewards, dones, first0, gamma):
    """(S, E) rewards/dones + (E,) first0 -> (returns, valid), both (S, E).

    valid marks steps of episodes that start AND end inside the window and
    run longer than one step; returns are within-episode discounted sums.
    """
    S, E = rewards.shape
    dones = dones.astype(jnp.float32)
    first0 = first0.astype(jnp.float32)

    def fwd(carry, first_t):
        started_prev, pos_prev = carry
        started = jnp.where(first_t > 0, 1.0, started_prev)
        pos = jnp.where(first_t > 0, 0.0, pos_prev + 1.0)
        return (started, pos), (started, pos)

    firsts = jnp.concatenate([first0[None], dones[:-1]], axis=0)
    (_, _), (started, pos) = jax.lax.scan(
        fwd, (jnp.zeros((E,)), jnp.zeros((E,))), firsts
    )

    def rev(carry, x):
        # a done at t closes the episode: t takes fresh values and earlier
        # steps of the same episode accumulate from them; a step with
        # done[t]=0 shares its episode with t+1, so the carry applies
        ret_next, closes_next, rem_next = carry
        r_t, d_t = x
        ret = r_t + gamma * ret_next * (1.0 - d_t)
        closes = jnp.where(d_t > 0, 1.0, closes_next)
        rem = jnp.where(d_t > 0, 0.0, rem_next + 1.0)
        return (ret, closes, rem), (ret, closes, rem)

    (_, _, _), (ret_r, closes_r, rem_r) = jax.lax.scan(
        rev,
        (jnp.zeros((E,)), jnp.zeros((E,)), jnp.zeros((E,))),
        (rewards[::-1], dones[::-1]),
    )
    returns = ret_r[::-1]
    closes = closes_r[::-1]
    rem = rem_r[::-1]
    length = pos + rem + 1.0
    valid = started * closes * (length >= 2.0)
    return returns, valid


class TrainRWRDiffusionDeviceAgent(TrainRWRDiffusionAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        super().__init__(cfg)
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self._jit_iteration = jax.jit(
            lambda s, p, f, r, i: self._fused_iteration(s, p, f, r, i, True)
        )
        self._jit_rollout_eval = jax.jit(
            lambda s, p, f, r, i: self._fused_iteration(s, p, f, r, i, False)
        )

    def _fused_iteration(self, state, pool_state, first0, rng, itr, train):
        act_steps = self.act_steps

        def macro_step(carry, step_rng):
            pool_state = carry
            cond = {"state": pool_state.hist}
            samples = self.model.forward(
                state.params, cond, step_rng, deterministic=not train
            )
            pool_state, out = self.pool.step_chunk(
                pool_state, samples[:, :act_steps]
            )
            done = out.terminated | out.truncated
            return pool_state, (
                cond["state"],
                samples,
                out.reward,
                done.astype(jnp.float32),
            )

        rng, roll_rng = jax.random.split(rng)
        step_rngs = jax.random.split(roll_rng, self.n_steps)
        pool_state, (obs_trajs, samples_trajs, reward_trajs, done_trajs) = (
            jax.lax.scan(macro_step, pool_state, step_rngs)
        )
        if not train:
            return pool_state, reward_trajs, done_trajs

        returns, valid = episode_returns_and_valid(
            reward_trajs, done_trajs, first0, self.gamma
        )
        S, E = reward_trajs.shape
        N = S * E
        state, loss = self._update(
            state,
            obs_trajs.reshape(N, *obs_trajs.shape[2:]),
            samples_trajs.reshape(N, *samples_trajs.shape[2:]),
            returns.reshape(N),
            valid.reshape(N),
            rng,
            itr,
        )
        return state, pool_state, reward_trajs, done_trajs, loss

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
            first0_dev = jnp.asarray(first0, jnp.float32)
            if eval_mode:
                pool_state, reward_trajs, done_trajs = jax.block_until_ready(
                    self._jit_rollout_eval(
                        self.state,
                        pool_state,
                        first0_dev,
                        self.next_rng(),
                        jnp.asarray(self.itr, jnp.int32),
                    )
                )
            else:
                (
                    self.state,
                    pool_state,
                    reward_trajs,
                    done_trajs,
                    loss,
                ) = jax.block_until_ready(
                    self._jit_iteration(
                        self.state,
                        pool_state,
                        first0_dev,
                        self.next_rng(),
                        jnp.asarray(self.itr, jnp.int32),
                    )
                )
                diag = {"loss": float(loss)}
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
