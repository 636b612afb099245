"""Running discounted-return reward normalization, on-device.

Parity with the reference's PPG-style scaler (`util/reward_scaling.py:42`
RunningRewardScaler / RunningMeanStd / backward_discounted_sum): rewards are
divided by the std of a rolling discounted backward sum and clipped to
±cliprew. The reference runs this in numpy on the host per iteration; here it
is a pure jittable function over a small carried state so it can live inside
the fused update program, and the variance update is a `psum`-friendly
Chan-merge so multi-host learners agree on the statistics.

State layout (all jnp scalars/arrays):
    mean, var, count  — running moments of the backward-discounted returns
    ret (n_envs,)     — discounted return carried across iterations
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RewardScalerState(NamedTuple):
    mean: jnp.ndarray  # ()
    var: jnp.ndarray  # ()
    count: jnp.ndarray  # ()
    ret: jnp.ndarray  # (n_envs,)


def init_reward_scaler(n_envs: int, epsilon: float = 1e-4) -> RewardScalerState:
    return RewardScalerState(
        mean=jnp.zeros(()),
        var=jnp.ones(()),
        count=jnp.asarray(epsilon, dtype=jnp.float32),
        ret=jnp.zeros((n_envs,)),
    )


def _update_moments(state: RewardScalerState, x: jnp.ndarray) -> RewardScalerState:
    batch_mean = jnp.mean(x)
    batch_var = jnp.var(x)
    batch_count = jnp.asarray(x.size, dtype=jnp.float32)
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * state.count * batch_count / tot
    # reference divides by (tot - 1) (`reward_scaling.py:38`)
    new_var = m2 / (tot - 1.0)
    return RewardScalerState(new_mean, new_var, tot, state.ret)


def backward_discounted_sum(prevret, reward, first, gamma):
    """rets[:, t] = reward[:, t] + (1 - first[:, t]) * gamma * rets[:, t-1].

    reward/first: (n_envs, n_steps); prevret: (n_envs,).
    """

    def body(carry, xs):
        r, f = xs
        ret = r + (1.0 - f) * gamma * carry
        return ret, ret

    _, rets = jax.lax.scan(body, prevret, (reward.T, first.T))
    return rets.T  # (n_envs, n_steps)


def scale_rewards(
    state: RewardScalerState,
    reward: jnp.ndarray,  # (n_steps, n_envs) — trainer layout
    first: jnp.ndarray,  # (n_steps, n_envs)
    gamma: float = 0.99,
    cliprew: float = 10.0,
    epsilon: float = 1e-8,
):
    """Return (new_state, scaled_rewards). Matches RunningRewardScaler.__call__."""
    rets = backward_discounted_sum(state.ret, reward.T, first.T, gamma)
    state = state._replace(ret=rets[:, -1])
    state = _update_moments(state, rets.reshape(-1))
    scaled = jnp.clip(
        reward / jnp.sqrt(state.var + epsilon), -cliprew, cliprew
    )
    return state, scaled
