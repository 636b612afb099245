"""SAC from scratch with a TPU-resident env: fused iteration BLOCKS.

The reference's SAC loop (`agent/finetune/train_sac_agent.py:70`, our
`finetune_sac.py`) advances ONE env step per iteration and runs critic/actor
updates at replay-ratio-derived frequencies — at its published operating
point (`cfg/gym/scratch/halfcheetah-v2/sac_mlp.yaml`: n_envs 1, n_steps 1,
1M iterations) that is millions of host↔device round trips. With
`env.backend=device` the env, the replay ring buffer (`utils/replay.py`,
device-resident), and the update math already live on the chip, so this
agent fuses a BLOCK of iterations — each being (sample action | uniform
explore) → env step → replay insert → conditionally critic update (every
`critic_update_freq` iters) → conditionally actor+temperature update (every
`actor_update_freq` iters) — into ONE `lax.scan` under ONE XLA dispatch.

Semantics per iteration match the host loop: same explore phase (uniform
actions for the first `n_explore_steps` iters, no updates), same update
frequencies via in-scan `lax.cond`, same truncation bootstrap (final_obs
feeds next_obs where truncated), same reward scaling. Blocks are cut at
every semantic boundary (explore end, val/log/save multiples, n_train_itr),
so no block ever straddles a phase change. Eval runs as a separate fused
deterministic rollout over `ceil(max_episode_steps / act_steps)` chunks —
one episode per device env (the host loop instead steps until
`n_eval_episode` episodes finish; with n_envs >= n_eval_episode this
evaluates at least as many).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from dppo_tpu.agents.device_fused import DeviceFusedMixin
from dppo_tpu.agents.finetune_calql import TrainCalQLAgent
from dppo_tpu.agents.finetune_ibrl import TrainIBRLAgent
from dppo_tpu.agents.finetune_rlpd import TrainRLPDAgent
from dppo_tpu.agents.finetune_sac import TrainSACAgent
from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.utils.replay import replay_insert, replay_insert_masked
from dppo_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class TrainSACDeviceAgent(TrainSACAgent):
    def __init__(self, cfg):
        DeviceFusedMixin._validate_device_cfg(cfg)
        ms = (cfg.env.get("wrappers") or {}).get("multi_step") or {}
        if not (ms.get("max_episode_steps") or cfg.env.get("max_episode_steps")):
            raise ValueError(
                "the fused device SAC agent needs a finite "
                "max_episode_steps (eval runs one episode per device env)"
            )
        super().__init__(cfg)
        assert isinstance(self.venv, DeviceVectorEnv)
        self.pool = self.venv.pool
        self.block_iters = int(cfg.train.get("block_iters", 512))
        # env steps one fused block iteration advances (CalQL: n_steps
        # macro-steps per iteration; SAC/RLPD/IBRL: one)
        self.env_steps_per_block_iter = self.n_envs * self.act_steps
        self._jit_block_cache = {}
        self._jit_eval = jax.jit(self._eval_rollout, static_argnames=("chunks",))

    # ------------------------------------------------------------- fused
    def _scan_updates(self, state, replay, itr, r_c, r_a):
        """Per-iteration update step inside the fused block. SAC default:
        critic every critic_update_freq iters, actor+temperature every
        actor_update_freq, both strictly AFTER the explore phase
        (host-loop parity: finetune_sac.py _should_update). RLPD/IBRL
        device subclasses override with their combined updates."""
        do_c = ((itr % self.critic_update_freq) == 0) & (
            itr > self.n_explore_steps
        )
        state, loss_c = jax.lax.cond(
            do_c,
            lambda s: self._critic_update(s, replay, r_c),
            lambda s: (s, jnp.float32(0.0)),
            state,
        )
        do_a = do_c & ((itr % self.actor_update_freq) == 0)
        state, loss_a = jax.lax.cond(
            do_a,
            lambda s: self._actor_update(s, replay, r_a),
            lambda s: (s, jnp.float32(0.0)),
            state,
        )
        return (
            state,
            loss_c,
            loss_a,
            do_c.astype(jnp.float32),
            do_a.astype(jnp.float32),
        )

    def _train_block(self, state, replay, pool_state, rng, itr0, block,
                     explore):
        """`block` fused iterations. explore/block are trace-static."""
        model = self.model
        E = self.n_envs

        def iteration(carry, i):
            state, replay, pool_state, rng = carry
            itr = itr0 + i
            rng, r_act, r_c, r_a = jax.random.split(rng, 4)
            obs = {"state": pool_state.hist}
            if explore:
                actions = jax.random.uniform(
                    r_act,
                    (E, self.act_steps, self.action_dim),
                    minval=-1.0,
                    maxval=1.0,
                )
            else:
                actions = model.sample(
                    state.params, obs, r_act, deterministic=False
                )[:, : self.act_steps]
            pool_state, out = self.pool.step_chunk(pool_state, actions)
            # truncation bootstrap: the pre-reset obs is the true next state
            next_state = jnp.where(
                out.truncated[:, None, None], out.final_obs, out.obs
            )
            replay = replay_insert(
                replay,
                {
                    "obs": obs["state"],
                    "next_obs": next_state,
                    "actions": actions,
                    "rewards": out.reward * self.scale_reward_factor,
                    "terminated": out.terminated.astype(jnp.float32),
                },
            )

            if explore:
                loss_c = jnp.float32(0.0)
                loss_a = jnp.float32(0.0)
                did_c = jnp.float32(0.0)
                did_a = jnp.float32(0.0)
            else:
                state, loss_c, loss_a, did_c, did_a = self._scan_updates(
                    state, replay, itr, r_c, r_a
                )

            done = out.terminated | out.truncated
            ys = (
                out.reward,
                done.astype(jnp.float32),
                loss_c,
                loss_a,
                did_c,
                did_a,
            )
            return (state, replay, pool_state, rng), ys

        (state, replay, pool_state, _), ys = jax.lax.scan(
            iteration,
            (state, replay, pool_state, rng),
            jnp.arange(block, dtype=jnp.int32),
        )
        rewards, dones, loss_c, loss_a, did_c, did_a = ys
        n_c = jnp.maximum(did_c.sum(), 1.0)
        n_a = jnp.maximum(did_a.sum(), 1.0)
        diag = {
            "loss_critic": (loss_c * did_c).sum() / n_c,
            "loss_actor": (loss_a * did_a).sum() / n_a,
            "num_critic_updates": did_c.sum(),
            "num_actor_updates": did_a.sum(),
            # IBRL params carry no temperature
            "alpha": jnp.exp(getattr(state.params, "log_alpha", jnp.zeros(()))),
        }
        return state, replay, pool_state, rewards, dones, diag

    def _jit_block(self, block: int, explore: bool):
        key = (block, explore)
        if key not in self._jit_block_cache:
            self._jit_block_cache[key] = jax.jit(
                lambda s, rp, ps, r, i0: self._train_block(
                    s, rp, ps, r, i0, block, explore
                )
            )
        return self._jit_block_cache[key]

    def _eval_rollout(self, params, pool_state, rng, chunks: int):
        model = self.model

        def chunk(carry, step_rng):
            pool_state = carry
            actions = model.sample(
                params,
                {"state": pool_state.hist},
                step_rng,
                deterministic=True,
            )[:, : self.act_steps]
            pool_state, out = self.pool.step_chunk(pool_state, actions)
            done = out.terminated | out.truncated
            return pool_state, (out.reward, done.astype(jnp.float32))

        pool_state, (rewards, dones) = jax.lax.scan(
            chunk, pool_state, jax.random.split(rng, chunks)
        )
        return pool_state, rewards, dones

    # ----------------------------------------------------- rollout state
    # The fused block's third carry slot is an opaque "rollout state" —
    # the env pool state by default; subclasses that carry extra
    # env-axis-aligned state across iterations (Cal-QL's pending-episode
    # window) wrap it here and unpack inside their `_train_block`.
    def _make_rollout_state(self, pool_state):
        return pool_state

    def _on_env_interrupt(self, roll):
        """Called right before the envs are reset mid-stream (eval).
        Subclasses flush episode-pending state here."""

    # -------------------------------------------------------------- run
    def _next_boundary(self) -> int:
        itr = self.itr
        cands = [self.n_train_itr]
        if itr < self.n_explore_steps:
            cands.append(self.n_explore_steps)
        for freq in (self.val_freq, self.log_freq, self.save_model_freq):
            if freq and freq > 0:
                cands.append((itr // freq + 1) * freq)
        return min(c for c in cands if c > itr)

    def run(self):
        timer = Timer()
        cnt_train_step = 0
        self.venv.reset_arg()
        roll = self._make_rollout_state(self.venv.pool_state)
        first0 = np.ones(self.n_envs)
        eval_chunks = max(
            1, -(-int(self.venv.pool.max_episode_steps) // self.act_steps)
        )
        while self.itr < self.n_train_itr:
            eval_mode = (
                self.itr % self.val_freq == 0
                and self.itr > self.n_explore_steps
                and not self.force_train
            )
            if eval_mode:
                # fresh episodes for eval, fresh again for the next block
                self._on_env_interrupt(roll)
                self.venv.reset_arg()
                _, rewards, dones = jax.block_until_ready(
                    self._jit_eval(
                        self.state.params,
                        self.venv.pool_state,
                        self.next_rng(),
                        chunks=eval_chunks,
                    )
                )
                rewards = np.asarray(rewards)
                firsts = np.zeros((rewards.shape[0] + 1, self.n_envs))
                firsts[0] = 1
                firsts[1:] = np.asarray(dones)
                stats = self._episode_stats(firsts, rewards)
                self._log_iteration(True, stats, {}, cnt_train_step, timer)
                self.venv.reset_arg()
                roll = self._make_rollout_state(self.venv.pool_state)
                first0 = np.ones(self.n_envs)
                self.itr += 1
                continue

            explore = self.itr < self.n_explore_steps
            block = min(self.block_iters, self._next_boundary() - self.itr)
            t0 = Timer()
            (
                self.state,
                self.replay,
                roll,
                rewards,
                dones,
                diag,
            ) = jax.block_until_ready(
                self._jit_block(block, explore)(
                    self.state,
                    self.replay,
                    roll,
                    self.next_rng(),
                    jnp.asarray(self.itr, jnp.int32),
                )
            )
            wall = t0()
            rewards = np.asarray(rewards)
            dones = np.asarray(dones)
            firsts = np.concatenate([first0[None], dones], axis=0)
            first0 = dones[-1]
            stats = self._episode_stats(firsts, rewards)
            cnt_train_step += block * self.env_steps_per_block_iter
            self.itr += block

            diag = {k: float(v) for k, v in diag.items()}
            diag["env_steps_per_s"] = (
                block * self.env_steps_per_block_iter / max(wall, 1e-9)
            )
            diag["block_iters"] = float(block)
            if (
                self.itr % self.save_model_freq == 0
                or self.itr >= self.n_train_itr
            ):
                self.save_model(self.state.params)
            if self.itr > self.n_explore_steps:
                self._log_iteration(False, stats, diag, cnt_train_step, timer)


class TrainRLPDDeviceAgent(TrainSACDeviceAgent, TrainRLPDAgent):
    """RLPD on the fused device block: the combined
    (critic_num_update ensemble TD steps + actor + temperature) update with
    50/50 offline/online batches (`_rlpd_update`) runs every non-explore
    iteration inside the scan (host parity: finetune_rlpd.py
    _should_update)."""

    def _scan_updates(self, state, replay, itr, r_c, r_a):
        do = itr > self.n_explore_steps

        def upd(s):
            return self._rlpd_update(s, replay, r_c)

        def skip(s):
            return s, jnp.float32(0.0), jnp.float32(0.0)

        state, loss_c, loss_a = jax.lax.cond(do, upd, skip, state)
        d = do.astype(jnp.float32)
        return state, loss_c, loss_a, d, d


class CalQLPend(NamedTuple):
    """Per-env pending-episode window: transitions of the CURRENT episode,
    awaiting the episode's Monte-Carlo reward-to-go (known only at episode
    end). Env-axis-aligned (leading axis E) so it shards with the pool
    state. `count[e]` = valid rows in [0, C)."""

    obs: jnp.ndarray  # (E, C, n_cond_step, obs_dim)
    next_obs: jnp.ndarray  # (E, C, n_cond_step, obs_dim)
    actions: jnp.ndarray  # (E, C, act_steps, action_dim)
    rewards: jnp.ndarray  # (E, C)
    terminated: jnp.ndarray  # (E, C)
    count: jnp.ndarray  # (E,) int32


class TrainCalQLDeviceAgent(TrainSACDeviceAgent, TrainCalQLAgent):
    """Cal-QL on the fused device block.

    Host-loop parity (`finetune_calql.py`, reference
    `train_calql_agent.py:258-276`): transitions pend per env until their
    episode finishes, at which point the episode's discounted Monte-Carlo
    reward-to-go is computed backward and the whole episode is flushed into
    the online replay ring — so the stored `reward_to_go` used by the CQL
    calibration bound max(Q, return) is a true per-episode MC return, not a
    window-truncated fragment. The pending window is a device-resident
    fixed-capacity pytree (`CalQLPend`, capacity = ceil(max_episode_steps /
    act_steps) macro-steps) carried across iterations AND blocks in the
    rollout-state slot; flushes are masked ring inserts
    (`replay_insert_masked`) under traced row counts. Episodes interrupted
    by an env reset (eval) are flushed as if truncated via
    `_on_env_interrupt` — the reference drops them instead (it only
    extends completed episodes); keeping the truncated-MC tail is a
    strictly-more-data deviation, documented in PARITY.md.

    Each block iteration = n_steps macro-steps (inner scan: env step →
    pend append → masked flush where done) + `num_update` mixed
    offline/online calibrated updates under `lax.cond`, gated strictly
    AFTER the explore phase in online mode (host `_should_update` parity:
    itr > n_explore_steps) and falling back to offline-only batches until
    the first completed episode reaches the online ring (host `size > 0`
    parity)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.env_steps_per_block_iter = (
            self.n_envs * self.act_steps * self.n_steps
        )
        # macro-step capacity of one episode under the MultiStep budget
        self.ep_chunks = max(
            1, -(-int(self.pool.max_episode_steps) // self.act_steps)
        )
        # the pending window writes row min(count, C-1): an episode longer
        # than ep_chunks macro-steps would silently overwrite its last
        # transition and corrupt the MC reward-to-go. The device pool
        # truncates every episode at max_episode_steps env-steps
        # (envs/device/core.py budget bookkeeping), which fits the window
        # by construction — enforce that invariant here so a pool/task
        # that stops truncating fails loudly instead.
        assert self.ep_chunks * self.act_steps >= int(
            self.pool.max_episode_steps
        ), (
            "CalQL pending window smaller than the episode budget: "
            f"{self.ep_chunks} chunks x {self.act_steps} act_steps < "
            f"{self.pool.max_episode_steps} max_episode_steps"
        )
        self._jit_flush_all = jax.jit(
            lambda rp, pend: self._flush_rows(
                rp, pend, jnp.ones((self.n_envs,), bool)
            )
        )

    # ----------------------------------------------------- pending window
    def _fresh_pend(self) -> CalQLPend:
        E, C = self.n_envs, self.ep_chunks
        return CalQLPend(
            obs=jnp.zeros((E, C, self.n_cond_step, self.obs_dim), jnp.float32),
            next_obs=jnp.zeros(
                (E, C, self.n_cond_step, self.obs_dim), jnp.float32
            ),
            actions=jnp.zeros(
                (E, C, self.act_steps, self.action_dim), jnp.float32
            ),
            rewards=jnp.zeros((E, C), jnp.float32),
            terminated=jnp.zeros((E, C), jnp.float32),
            count=jnp.zeros((E,), jnp.int32),
        )

    def _make_rollout_state(self, pool_state):
        return (pool_state, self._fresh_pend())

    def _on_env_interrupt(self, roll):
        _, pend = roll
        self.replay = jax.block_until_ready(
            self._jit_flush_all(self.replay, pend)
        )

    def _pend_rtg(self, pend: CalQLPend, valid: jnp.ndarray) -> jnp.ndarray:
        """Backward discounted MC return over each env's valid prefix."""

        def step(acc, x):
            r_t, term_t, valid_t = x  # each (E,)
            acc = jnp.where(
                valid_t, r_t + self.gamma * acc * (1.0 - term_t), acc
            )
            return acc, acc

        xs = (
            pend.rewards.T[::-1],
            pend.terminated.T[::-1],
            valid.T[::-1],
        )  # (C, E) reversed in time
        _, rtg_rev = jax.lax.scan(step, jnp.zeros((self.n_envs,)), xs)
        return rtg_rev[::-1].T  # (E, C)

    def _flush_rows(self, replay, pend: CalQLPend, env_mask):
        """Masked-insert the valid pending rows of the envs in `env_mask`
        (their episodes just ended) with per-episode MC reward-to-go."""
        C = self.ep_chunks
        valid = jnp.arange(C)[None, :] < pend.count[:, None]  # (E, C)
        rtg = self._pend_rtg(pend, valid)
        mask = env_mask[:, None] & valid

        def flat(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        batch = {
            "obs": flat(pend.obs),
            "next_obs": flat(pend.next_obs),
            "actions": flat(pend.actions),
            "rewards": flat(pend.rewards),
            "terminated": flat(pend.terminated),
            "reward_to_go": flat(rtg),
        }
        return replay_insert_masked(replay, batch, mask.reshape(-1))

    # -------------------------------------------------------------- fused
    def _train_block(self, state, replay, roll, rng, itr0, block, explore):
        model = self.model
        E = self.n_envs
        C = self.ep_chunks
        pool_state, pend = roll

        def iteration(carry, i):
            state, replay, pool_state, pend, rng = carry
            itr = itr0 + i
            rng, r_roll, r_upd = jax.random.split(rng, 3)

            def env_step(c, step_rng):
                pool_state, pend, replay = c
                obs = {"state": pool_state.hist}
                if explore:
                    actions = jax.random.uniform(
                        step_rng,
                        (E, self.act_steps, self.action_dim),
                        minval=-1.0,
                        maxval=1.0,
                    )
                else:
                    actions = model.sample(
                        state.params, obs, step_rng, deterministic=False
                    )[:, : self.act_steps]
                pool_state, out = self.pool.step_chunk(pool_state, actions)
                next_state = jnp.where(
                    out.truncated[:, None, None], out.final_obs, out.obs
                )
                done = out.terminated | out.truncated
                e = jnp.arange(E)
                row = jnp.minimum(pend.count, C - 1)
                pend = CalQLPend(
                    obs=pend.obs.at[e, row].set(obs["state"]),
                    next_obs=pend.next_obs.at[e, row].set(next_state),
                    actions=pend.actions.at[e, row].set(actions),
                    rewards=pend.rewards.at[e, row].set(
                        out.reward * self.scale_reward_factor
                    ),
                    terminated=pend.terminated.at[e, row].set(
                        out.terminated.astype(jnp.float32)
                    ),
                    count=jnp.minimum(pend.count + 1, C),
                )
                replay = self._flush_rows(replay, pend, done)
                pend = pend._replace(
                    count=jnp.where(done, 0, pend.count)
                )
                return (pool_state, pend, replay), (
                    out.reward,
                    done.astype(jnp.float32),
                )

            (pool_state, pend, replay), (raw_rew, dones) = jax.lax.scan(
                env_step,
                (pool_state, pend, replay),
                jax.random.split(r_roll, self.n_steps),
            )

            # host parity (_should_update): offline phase updates every
            # iteration; online strictly AFTER the explore phase, on
            # offline-only batches until the online ring is non-empty
            if explore and self.train_online:
                losses = jnp.zeros((2,))
                did = jnp.float32(0.0)
            elif self.train_online:

                def upd(s):
                    return jax.lax.cond(
                        replay.size > 0,
                        lambda ss: self._calql_update(
                            ss, replay, r_upd, use_online=True
                        ),
                        lambda ss: self._calql_update(
                            ss, replay, r_upd, use_online=False
                        ),
                        s,
                    )

                do = itr > self.n_explore_steps
                state, losses = jax.lax.cond(
                    do, upd, lambda s: (s, jnp.zeros((2,))), state
                )
                did = do.astype(jnp.float32)
            else:
                state, losses = self._calql_update(
                    state, replay, r_upd, use_online=False
                )
                did = jnp.float32(1.0)
            ys = (raw_rew, dones, losses[0], losses[1], did)
            return (state, replay, pool_state, pend, rng), ys

        (state, replay, pool_state, pend, _), ys = jax.lax.scan(
            iteration,
            (state, replay, pool_state, pend, rng),
            jnp.arange(block, dtype=jnp.int32),
        )
        rewards, dones, loss_c, loss_a, did = ys
        n_u = jnp.maximum(did.sum(), 1.0)
        diag = {
            "loss_critic": (loss_c * did).sum() / n_u,
            "loss_actor": (loss_a * did).sum() / n_u,
            "num_critic_updates": did.sum() * self.num_update,
            "num_actor_updates": did.sum() * self.num_update,
            "alpha": jnp.exp(state.params.log_alpha),
        }
        # (block, n_steps, E) -> (block*n_steps, E) for episode accounting
        S = rewards.shape[0] * rewards.shape[1]
        return (
            state,
            replay,
            (pool_state, pend),
            rewards.reshape(S, E),
            dones.reshape(S, E),
            diag,
        )


class TrainIBRLDeviceAgent(TrainSACDeviceAgent, TrainIBRLAgent):
    """IBRL on the fused device block: the combined
    (critic_num_update ensemble TD steps + actor) update (`_ibrl_update`)
    runs every `update_freq` non-explore iterations inside the scan
    (host parity: finetune_ibrl.py _should_update)."""

    def _scan_updates(self, state, replay, itr, r_c, r_a):
        do = (itr > self.n_explore_steps) & ((itr % self.update_freq) == 0)

        def upd(s):
            return self._ibrl_update(s, replay, r_c)

        def skip(s):
            return s, jnp.float32(0.0), jnp.float32(0.0)

        state, loss_c, loss_a = jax.lax.cond(do, upd, skip, state)
        d = do.astype(jnp.float32)
        return state, loss_c, loss_a, d, d
