"""Parity of the batched native-rollout env pool vs the per-env stack.

The batched backend fuses gym sim + MujocoLocomotionLowdimWrapper +
MultiStep + vector pool into one threaded C rollout per macro step. These
tests pin its semantics to the layered stack it replaces: with solver
warmstarting disabled on both sides (the one stateful solver accelerant that
gymnasium carries across steps and the batched pool zeroes per macro step),
trajectories must match to float tolerance — observations, rewards,
terminated/truncated flags, in-pool resets, and `final_obs` included.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

from dppo_tpu.envs import make_async
from dppo_tpu.envs.batched_mujoco import (
    BatchedMujocoLocomotionEnv,
    supports_batched_backend,
)
from dppo_tpu.envs.multi_step import MultiStep
from dppo_tpu.envs.vector import SyncVectorEnv
from dppo_tpu.envs.wrappers.mujoco_locomotion import (
    MujocoLocomotionLowdimWrapper,
)

N_ENVS = 4
ACT_STEPS = 4


@pytest.fixture(scope="module")
def norm_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("norm") / "normalization.npz"
    rng = np.random.default_rng(0)
    np.savez(
        p,
        obs_min=-2 * np.ones(11) + 0.1 * rng.standard_normal(11),
        obs_max=2 * np.ones(11),
        action_min=-np.ones(3),
        action_max=np.ones(3),
    )
    return str(p)


def _ref_env_fn(norm_path, max_steps, n_obs_steps=1, disable_warmstart=True):
    def fn():
        env = gymnasium.make("Hopper-v4", max_episode_steps=int(1e9))
        if disable_warmstart:
            env.unwrapped.model.opt.disableflags |= (
                mujoco.mjtDisableBit.mjDSBL_WARMSTART
            )
        task = MujocoLocomotionLowdimWrapper(env, normalization_path=norm_path)
        return MultiStep(
            task,
            n_obs_steps=n_obs_steps,
            n_action_steps=ACT_STEPS,
            max_episode_steps=max_steps,
            reset_within_step=True,
        )

    return fn


def _batched(norm_path, max_steps, n_obs_steps=1):
    return BatchedMujocoLocomotionEnv(
        "hopper-medium-v2",
        N_ENVS,
        norm_path,
        n_obs_steps=n_obs_steps,
        n_action_steps=ACT_STEPS,
        max_episode_steps=max_steps,
        reset_within_step=True,
        disable_warmstart=True,
    )


def test_reset_parity(norm_path):
    """Reset draws are bit-identical to gymnasium's (same PCG64 stream)."""
    ref = SyncVectorEnv([_ref_env_fn(norm_path, 40) for _ in range(N_ENVS)])
    bat = _batched(norm_path, 40)
    seeds = [7, 8, 9, 10]
    ref.seed(seeds)
    bat.seed(seeds)
    o_ref = ref.reset_arg()
    o_bat = bat.reset_arg()
    np.testing.assert_array_equal(o_ref["state"], o_bat["state"])
    ref.close()
    bat.close()


@pytest.mark.parametrize("n_obs_steps", [1, 3])
def test_trajectory_parity(norm_path, n_obs_steps):
    """Long rollout with terminations, in-pool resets, and truncation at the
    episode budget: every output matches the layered reference stack."""
    max_steps = 24  # multiple of nothing in particular; forces truncations
    ref = SyncVectorEnv(
        [_ref_env_fn(norm_path, max_steps, n_obs_steps) for _ in range(N_ENVS)]
    )
    bat = _batched(norm_path, max_steps, n_obs_steps)
    seeds = list(range(100, 100 + N_ENVS))
    ref.seed(seeds)
    bat.seed(seeds)
    o_ref = ref.reset_arg()
    o_bat = bat.reset_arg()
    np.testing.assert_array_equal(o_ref["state"], o_bat["state"])

    rng = np.random.default_rng(5)
    n_term = n_trunc = 0
    for t in range(20):
        a = rng.uniform(-1, 1, size=(N_ENVS, ACT_STEPS, 3)).astype(np.float32)
        o_ref, r_ref, te_ref, tr_ref, i_ref = ref.step(a)
        o_bat, r_bat, te_bat, tr_bat, i_bat = bat.step(a)
        np.testing.assert_array_equal(te_ref, te_bat, err_msg=f"step {t}")
        np.testing.assert_array_equal(tr_ref, tr_bat, err_msg=f"step {t}")
        np.testing.assert_allclose(r_ref, r_bat, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            o_ref["state"], o_bat["state"], rtol=1e-5, atol=1e-6
        )
        for i in range(N_ENVS):
            assert ("final_obs" in i_ref[i]) == ("final_obs" in i_bat[i])
            if "final_obs" in i_ref[i]:
                np.testing.assert_allclose(
                    i_ref[i]["final_obs"]["state"],
                    i_bat[i]["final_obs"]["state"],
                    rtol=1e-5,
                    atol=1e-6,
                )
        n_term += int(te_ref.sum())
        n_trunc += int(tr_ref.sum())
    # the rollout must actually have exercised both code paths
    assert n_term > 0, "no termination happened; test is vacuous"
    assert n_trunc > 0, "no truncation happened; test is vacuous"
    ref.close()
    bat.close()


def test_split_phase_and_reset_one(norm_path):
    bat = _batched(norm_path, 40)
    bat.seed([1, 2, 3, 4])
    bat.reset_arg()
    a = np.zeros((N_ENVS, ACT_STEPS, 3), np.float32)
    bat.step_async(a)
    obs, r, te, tr, _ = bat.step_wait()
    assert obs["state"].shape == (N_ENVS, 1, 11)
    single = bat.reset_one_arg(2)
    assert single["state"].shape == (1, 11)
    bat.close()


def test_make_async_backend(norm_path):
    venv = make_async(
        "hopper-medium-v2",
        num_envs=3,
        max_episode_steps=16,
        backend="batched_mujoco",
        wrappers={
            "mujoco_locomotion_lowdim": {"normalization_path": norm_path},
            "multi_step": {
                "n_obs_steps": 1,
                "n_action_steps": ACT_STEPS,
                "reset_within_step": True,
            },
        },
    )
    venv.seed([0, 1, 2])
    obs = venv.reset_arg()
    assert obs["state"].shape == (3, 1, 11)
    obs, r, te, tr, _ = venv.step(
        np.zeros((3, ACT_STEPS, 3), np.float32)
    )
    assert np.isfinite(r).all()
    venv.close()


def test_supports():
    assert supports_batched_backend("hopper-medium-v2")
    assert supports_batched_backend("walker2d-medium-v2")
    assert supports_batched_backend("halfcheetah-medium-v2")
    assert not supports_batched_backend("kitchen-complete-v0")


def test_walker_and_cheetah_smoke(norm_path, tmp_path):
    for name, do, da in [
        ("walker2d-medium-v2", 17, 6),
        ("halfcheetah-medium-v2", 17, 6),
    ]:
        p = tmp_path / f"{name}.npz"
        np.savez(
            p,
            obs_min=-2 * np.ones(do),
            obs_max=2 * np.ones(do),
            action_min=-np.ones(da),
            action_max=np.ones(da),
        )
        env = BatchedMujocoLocomotionEnv(
            name, 2, str(p), n_action_steps=ACT_STEPS, max_episode_steps=20
        )
        env.seed([0, 1])
        env.reset_arg()
        rng = np.random.default_rng(0)
        for _ in range(6):
            obs, r, te, tr, _ = env.step(
                rng.uniform(-1, 1, (2, ACT_STEPS, da)).astype(np.float32)
            )
            assert np.isfinite(r).all()
            assert np.isfinite(obs["state"]).all()
        env.close()


def test_batched_split_phase_guards(norm_path):
    bat = _batched(norm_path, 40)
    bat.seed([1, 2, 3, 4])
    bat.reset_arg()
    a = np.zeros((N_ENVS, ACT_STEPS, 3), np.float32)
    with pytest.raises(RuntimeError):
        bat.step_wait()
    bat.step_async(a)
    with pytest.raises(RuntimeError):
        bat.step_async(a)
    with pytest.raises(RuntimeError):
        bat.step(a)
    with pytest.raises(RuntimeError):
        bat.reset_arg()
    bat.step_wait()
    bat.close()


def test_make_async_backend_defaults_match_multistep(norm_path):
    """Omitted multi_step keys default the same as MultiStep; unsupported
    options are rejected rather than silently ignored."""
    venv = make_async(
        "hopper-medium-v2",
        num_envs=2,
        max_episode_steps=16,
        backend="batched_mujoco",
        wrappers={
            "mujoco_locomotion_lowdim": {"normalization_path": norm_path},
            "multi_step": {"n_obs_steps": 1, "n_action_steps": ACT_STEPS},
        },
    )
    assert venv.reset_within_step is False  # MultiStep's default
    venv.close()
    for bad in [
        {"reward_agg_method": "max"},
        {"pass_full_observations": True},
    ]:
        with pytest.raises(NotImplementedError):
            make_async(
                "hopper-medium-v2",
                num_envs=2,
                max_episode_steps=16,
                backend="batched_mujoco",
                wrappers={
                    "mujoco_locomotion_lowdim": {
                        "normalization_path": norm_path
                    },
                    "multi_step": {"n_action_steps": ACT_STEPS, **bad},
                },
            )


def test_fused_mode_normalization():
    from dppo_tpu.ops.pallas.fused_chain import normalize_fused_mode

    assert normalize_fused_mode(True) == "on"
    assert normalize_fused_mode(False) == "off"  # YAML `off` parses as False
    assert normalize_fused_mode("AUTO") == "auto"
    with pytest.raises(ValueError):
        normalize_fused_mode("sometimes")
