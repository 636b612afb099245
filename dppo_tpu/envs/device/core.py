"""Pure-function batched MultiStep pool over device tasks.

Semantics parity with the host `MultiStep` wrapper
(`env/gym_utils/wrapper/multi_step.py:82`, our `envs/multi_step.py`),
vectorized over N envs and expressed as jittable pure functions so a whole
rollout can live inside one XLA program:

- executes up to `n_action_steps` substeps per `step_chunk` call, stopping
  (per env) at the first termination or at the episode-step budget
  (termination wins ties, `multi_step.py:88-95`);
- reward is the sum over executed substeps;
- maintains an `n_obs_steps` observation history with edge padding at
  reset (`stack_last_n_obs`, `multi_step.py:24`);
- separates terminated from truncated;
- optional in-pool auto-reset on done with the pre-reset observation
  reported as `final_obs` for truncation bootstrapping
  (`multi_step.py:105-110` — final_obs is only meaningful where
  `truncated`, matching the wrapper which only stashes it then).

A DeviceTask is any object with `obs_dim`, `action_dim` and two pure
per-env functions, batched here with `vmap`:

    reset(rng)              -> (phys_state_pytree, obs (Do,))
    step(phys, action, rng) -> (phys, obs (Do,), reward (), terminated ())

Observations returned by tasks are already normalized (tasks own their
min/max→[-1,1] normalization, like the host task wrappers); actions passed
in are in [-1,1] and unnormalized inside the task.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    phys: Any  # task state pytree, leading dim N
    hist: jnp.ndarray  # (N, To, Do) normalized obs history
    cnt: jnp.ndarray  # (N,) int32 substeps taken in the current episode
    rng: jnp.ndarray  # (N,) per-env PRNG keys


class StepOut(NamedTuple):
    obs: jnp.ndarray  # (N, To, Do) post-step (post-reset if auto-reset hit)
    reward: jnp.ndarray  # (N,) float32 summed over executed substeps
    terminated: jnp.ndarray  # (N,) bool
    truncated: jnp.ndarray  # (N,) bool (exclusive of terminated)
    final_obs: jnp.ndarray  # (N, To, Do) pre-reset history (valid where truncated)


def _tree_where(mask: jnp.ndarray, a, b):
    """Per-env select between two batched pytrees (mask: (N,) bool)."""

    def sel(x, y):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


class DevicePool:
    """Functional N-env pool with MultiStep semantics. All methods taking a
    PoolState are pure and jittable; the class only holds static config."""

    def __init__(
        self,
        task,
        n_envs: int,
        n_obs_steps: int = 1,
        n_action_steps: int = 1,
        max_episode_steps: int | None = None,
        reset_within_step: bool = False,
    ):
        self.task = task
        self.n_envs = int(n_envs)
        self.n_obs_steps = int(n_obs_steps)
        self.n_action_steps = int(n_action_steps)
        self.max_episode_steps = (
            None if max_episode_steps is None else int(max_episode_steps)
        )
        self.reset_within_step = bool(reset_within_step)

    # ------------------------------------------------------------- reset
    def _edge_pad(self, obs: jnp.ndarray) -> jnp.ndarray:
        """(N, Do) -> (N, To, Do) edge-padded history (multi_step.py:29-31)."""
        return jnp.repeat(obs[:, None, :], self.n_obs_steps, axis=1)

    def reset_all(self, rng: jnp.ndarray) -> PoolState:
        """rng: either one key (split here) or (N,) per-env keys."""
        if rng.ndim == 0:
            rng = jax.random.split(rng, self.n_envs)
        ks = jax.vmap(jax.random.split)(rng)  # (N, 2) keys
        phys, obs = jax.vmap(self.task.reset)(ks[:, 1])
        return PoolState(
            phys=phys,
            hist=self._edge_pad(obs),
            cnt=jnp.zeros((self.n_envs,), dtype=jnp.int32),
            rng=ks[:, 0],
        )

    def reset_where(self, state: PoolState, mask: jnp.ndarray) -> PoolState:
        """Re-draw initial states for envs where mask is True. The per-env
        rng advances unconditionally (harmless: key consumption carries no
        semantics for untouched envs, and typed keys can't be `where`d)."""
        ks = jax.vmap(jax.random.split)(state.rng)
        phys_new, obs_new = jax.vmap(self.task.reset)(ks[:, 1])
        return PoolState(
            phys=_tree_where(mask, phys_new, state.phys),
            hist=_tree_where(mask, self._edge_pad(obs_new), state.hist),
            cnt=jnp.where(mask, 0, state.cnt),
            rng=ks[:, 0],
        )

    # -------------------------------------------------------------- step
    def step_chunk(self, state: PoolState, actions: jnp.ndarray):
        """actions: (N, S, Da) normalized chunk -> (PoolState, StepOut)."""
        N, S = actions.shape[0], actions.shape[1]
        assert N == self.n_envs
        budget = (
            jnp.inf if self.max_episode_steps is None else self.max_episode_steps
        )

        def substep(carry, act_t):
            phys, hist, cnt, rng, term, trunc, rew = carry
            active = ~(term | trunc)
            ks = jax.vmap(jax.random.split)(rng)  # (N, 2)
            rng = ks[:, 0]
            phys2, obs2, r, tm = jax.vmap(self.task.step)(phys, act_t, ks[:, 1])
            phys = _tree_where(active, phys2, phys)
            hist2 = jnp.concatenate([hist[:, 1:], obs2[:, None]], axis=1)
            hist = _tree_where(active, hist2, hist)
            cnt = cnt + active.astype(jnp.int32)
            rew = rew + jnp.where(active, r, 0.0)
            tm = tm & active
            term = term | tm
            # budget check after the substep; termination wins ties
            # (multi_step.py:88-95)
            trunc = trunc | (active & ~tm & (cnt >= budget))
            return (phys, hist, cnt, rng, term, trunc, rew), None

        init = (
            state.phys,
            state.hist,
            state.cnt,
            state.rng,
            jnp.zeros((N,), dtype=bool),
            jnp.zeros((N,), dtype=bool),
            jnp.zeros((N,), dtype=jnp.float32),
        )
        (phys, hist, cnt, rng, term, trunc, rew), _ = jax.lax.scan(
            substep, init, jnp.swapaxes(actions, 0, 1)
        )

        new_state = PoolState(phys=phys, hist=hist, cnt=cnt, rng=rng)
        final_obs = hist
        obs = hist
        if self.reset_within_step:
            done = term | trunc
            new_state = self.reset_where(new_state, done)
            obs = new_state.hist
        return new_state, StepOut(
            obs=obs,
            reward=rew,
            terminated=term,
            truncated=trunc,
            final_obs=final_obs,
        )
