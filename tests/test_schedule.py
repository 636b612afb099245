"""Golden-value tests for DDPM/DDIM schedule tables against independent
numpy derivations of the published cosine-schedule / DDPM posterior formulas
(Nichol & Dhariwal 2021; Ho et al. 2020; Song et al. 2020 DDIM)."""

import numpy as np
import jax.numpy as jnp

from dppo_tpu.ops.schedule import (
    cosine_beta_schedule,
    extract,
    make_ddim_tables,
    make_ddpm_tables,
)


def _alphas_cumprod(K):
    betas = cosine_beta_schedule(K)
    return np.cumprod(1.0 - betas), betas


def test_cosine_schedule_values():
    K = 20
    betas = cosine_beta_schedule(K)
    assert betas.shape == (K,)
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    # independent closed-form: f(t) = cos^2(((t/(K+1)) + s)/(1+s) * pi/2)
    s = 0.008
    steps = K + 1
    x = np.linspace(0, steps, steps)
    f = np.cos(((x / steps) + s) / (1 + s) * np.pi / 2) ** 2
    expected = 1 - (f / f[0])[1:] / (f / f[0])[:-1]
    np.testing.assert_allclose(betas, np.clip(expected, 0, 0.999), rtol=1e-6)


def test_ddpm_posterior_tables():
    K = 20
    tab = make_ddpm_tables(K)
    acp, betas = _alphas_cumprod(K)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    # posterior variance beta_tilde = beta_t (1 - abar_{t-1}) / (1 - abar_t)
    np.testing.assert_allclose(
        np.asarray(tab.ddpm_var), betas * (1 - acp_prev) / (1 - acp), rtol=1e-5
    )
    # mu coefficients of q(x_{t-1} | x_t, x0)
    np.testing.assert_allclose(
        np.asarray(tab.ddpm_mu_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tab.ddpm_mu_coef2),
        (1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tab.sqrt_recipm1_alphas_cumprod),
        np.sqrt(1.0 / acp - 1.0),
        rtol=1e-5,
    )


def test_ddim_tables_leading_uniform():
    K, Kd = 20, 5
    tab = make_ddim_tables(K, Kd)
    acp, _ = _alphas_cumprod(K)
    # leading style: t = [0, 4, 8, 12, 16], flipped to sampling order
    np.testing.assert_array_equal(np.asarray(tab.t), [16, 12, 8, 4, 0])
    np.testing.assert_allclose(np.asarray(tab.alphas), acp[[16, 12, 8, 4, 0]], rtol=1e-6)
    # alphas_prev: prev in *timestep* order then flipped
    expected_prev = np.concatenate([[1.0], acp[[0, 4, 8, 12]]])[::-1]
    np.testing.assert_allclose(np.asarray(tab.alphas_prev), expected_prev, rtol=1e-6)
    assert np.all(np.asarray(tab.sigmas) == 0)


def test_extract_broadcast():
    tab = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(tab, t, 3)
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])


def test_cosine_warmup_restarts_cycle_mult_golden():
    """cycle_mult != 1 matches a python replica of the reference's
    epoch-indexed closed form (util/scheduler.py:113-128): cycle n starts
    at first*(m^n - 1)/(m - 1), is first*m^n long, max lr decays by
    gamma**n, warmup ramps from min_lr inside each cycle."""
    import math

    import numpy as np

    from dppo_tpu.utils.scheduler import cosine_warmup_restarts

    max_lr, min_lr, first, warm, gamma, m = 1e-3, 1e-5, 10, 3, 0.9, 2.0

    def reference(epoch):
        if epoch >= first:
            n = int(math.log(epoch / first * (m - 1) + 1, m))
            cycle_start = int(first * (m**n - 1) / (m - 1))
            step_in_cycle = epoch - cycle_start
            cur = first * m**n
        else:
            n, step_in_cycle, cur = 0, epoch, first
        cur_max = max_lr * gamma**n
        if step_in_cycle < warm:
            return (cur_max - min_lr) * step_in_cycle / warm + min_lr
        return min_lr + (cur_max - min_lr) * (
            1 + math.cos(math.pi * (step_in_cycle - warm) / (cur - warm))
        ) / 2

    sched = cosine_warmup_restarts(
        max_lr, min_lr, first, warm, gamma=gamma, cycle_mult=m
    )
    for step in range(0, 160):
        np.testing.assert_allclose(
            float(sched(step)), reference(step), rtol=1e-5, atol=1e-9,
            err_msg=f"step {step}",
        )
