"""Cosine-annealing-with-warmup-restarts learning-rate schedule.

Pure function of the step count — usable both as an optax schedule and for
per-iteration lr computation inside a jitted train step. Matches the torch
scheduler used for every optimizer in the reference
(`util/scheduler.py:32` CosineAnnealingWarmupRestarts, base lr initialised
to min_lr): during warmup the lr ramps linearly from min_lr to max_lr over
`warmup_steps`, then follows a half-cosine from max_lr down to min_lr over
the remainder of the cycle; cycles repeat with max lr scaled by
`gamma**cycle`. `cycle_mult != 1` grows each cycle geometrically, matching
the reference's epoch-indexed closed form (`util/scheduler.py:113-128`:
cycle n starts at first*(m^n - 1)/(m - 1) and is first*m^n long; no
shipped reference config uses it, but the knob is honored).

Caveat (advisor r3): the reference scheduler has TWO inconsistent
cycle_mult branches. Its training loops call no-arg `step()`, whose
incremental recurrence grows cycles as cur=(cur-warmup)*mult+warmup
(`util/scheduler.py:106-115`) — that diverges from the epoch-indexed
closed form above whenever warmup_steps > 0. This module implements the
closed form; with cycle_mult == 1 (every shipped config) the two agree
exactly (pinned against the real torch scheduler's no-arg step() path in
tests/test_reference_parity_more.py::TestUtilParity).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warmup_restarts(
    max_lr: float,
    min_lr: float,
    first_cycle_steps: int,
    warmup_steps: int = 0,
    gamma: float = 1.0,
    cycle_mult: float = 1.0,
):
    """Return schedule(step) -> lr. `step` may be a python int or jnp scalar."""
    assert warmup_steps < first_cycle_steps

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            step_in_cycle = step - cycle * first_cycle_steps
            cur_cycle_steps = jnp.float32(first_cycle_steps)
        else:
            m = cycle_mult
            # closed form (reference scheduler.py:113-128): cycle index from
            # the geometric sum of cycle lengths first * m^n
            cycle = jnp.floor(
                jnp.log(
                    jnp.maximum(step / first_cycle_steps * (m - 1.0) + 1.0, 1.0)
                )
                / math.log(m)
            )
            cycle_start = first_cycle_steps * (m**cycle - 1.0) / (m - 1.0)
            step_in_cycle = step - cycle_start
            cur_cycle_steps = first_cycle_steps * m**cycle
        cycle_max_lr = max_lr * gamma**cycle
        warm_frac = jnp.where(
            warmup_steps > 0, step_in_cycle / max(warmup_steps, 1), 1.0
        )
        warm_lr = min_lr + (cycle_max_lr - min_lr) * warm_frac
        cos_lr = min_lr + (cycle_max_lr - min_lr) * 0.5 * (
            1.0
            + jnp.cos(
                jnp.pi
                * (step_in_cycle - warmup_steps)
                / (cur_cycle_steps - warmup_steps)
            )
        )
        return jnp.where(step_in_cycle < warmup_steps, warm_lr, cos_lr)

    return schedule
