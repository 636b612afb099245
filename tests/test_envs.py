"""Tests for the env layer: MultiStep semantics, vector pools, factory."""

import numpy as np
import pytest

from dppo_tpu.envs import make_async
from dppo_tpu.envs.multi_step import MultiStep, stack_last_n_obs
from dppo_tpu.envs.vector import AsyncVectorEnv, SyncVectorEnv
from dppo_tpu.envs.wrappers.dummy import DummyLowdimWrapper

OBS, ACT = 5, 2


def _env_fn():
    return MultiStep(
        DummyLowdimWrapper(obs_dim=OBS, action_dim=ACT),
        n_obs_steps=2,
        n_action_steps=3,
        max_episode_steps=10,
        reset_within_step=True,
    )


def test_stack_last_n_obs_pads_with_edge():
    out = stack_last_n_obs([np.array([1.0, 2.0])], 3)
    np.testing.assert_array_equal(out, [[1, 2], [1, 2], [1, 2]])
    out = stack_last_n_obs([np.array([1.0]), np.array([2.0])], 2)
    np.testing.assert_array_equal(out, [[1], [2]])


def test_multistep_chunk_and_history():
    env = _env_fn()
    env.seed(0)
    obs = env.reset()
    assert obs["state"].shape == (2, OBS)
    # history at reset is edge-padded (both rows equal)
    np.testing.assert_array_equal(obs["state"][0], obs["state"][1])
    obs, reward, term, trunc, info = env.step(np.zeros((3, ACT)))
    assert obs["state"].shape == (2, OBS)
    assert isinstance(reward, float)
    assert not term


def test_multistep_truncation_and_reset_within_step():
    env = _env_fn()
    env.seed(0)
    env.reset()
    # 10-step budget, 3 substeps per call -> truncates within 4th call
    for i in range(3):
        _, _, term, trunc, info = env.step(np.zeros((3, ACT)))
        assert not trunc
    obs, _, term, trunc, info = env.step(np.zeros((3, ACT)))
    assert trunc
    assert "final_obs" in info  # stashed for bootstrap
    # env auto-reset: next step works immediately
    obs, _, _, trunc2, _ = env.step(np.zeros((3, ACT)))
    assert not trunc2


def test_sync_vector_env():
    venv = SyncVectorEnv([_env_fn for _ in range(4)])
    venv.seed(list(range(4)))
    obs = venv.reset_arg()
    assert obs["state"].shape == (4, 2, OBS)
    obs, rew, term, trunc, infos = venv.step(np.zeros((4, 3, ACT)))
    assert rew.shape == (4,) and term.shape == (4,) and len(infos) == 4
    # per-env reset
    one = venv.reset_one_arg(2, {})
    assert one["state"].shape == (2, OBS)


def test_async_vector_env_matches_sync():
    sync = SyncVectorEnv([_env_fn for _ in range(4)])
    asyn = AsyncVectorEnv([_env_fn for _ in range(4)], n_workers=2)
    sync.seed([7, 8, 9, 10])
    asyn.seed([7, 8, 9, 10])
    o1 = sync.reset_arg()
    o2 = asyn.reset_arg()
    np.testing.assert_allclose(o1["state"], o2["state"])
    a = np.random.default_rng(0).standard_normal((4, 3, ACT)).astype(np.float32)
    r1 = sync.step(a)
    r2 = asyn.step(a)
    np.testing.assert_allclose(r1[0]["state"], r2[0]["state"], rtol=1e-6)
    np.testing.assert_allclose(r1[1], r2[1], rtol=1e-6)
    asyn.close()


def test_split_phase_step_matches_step():
    """step_async/step_wait (the rollout-overlap API) == plain step."""
    a = np.random.default_rng(1).standard_normal((4, 3, ACT)).astype(np.float32)
    plain = SyncVectorEnv([_env_fn for _ in range(4)])
    split = SyncVectorEnv([_env_fn for _ in range(4)])
    plain.seed([3, 4, 5, 6])
    split.seed([3, 4, 5, 6])
    plain.reset_arg()
    split.reset_arg()
    r1 = plain.step(a)
    split.step_async(a)
    r2 = split.step_wait()
    np.testing.assert_allclose(r1[0]["state"], r2[0]["state"])
    np.testing.assert_allclose(r1[1], r2[1])

    asyn = AsyncVectorEnv([_env_fn for _ in range(4)], n_workers=2)
    asyn.seed([3, 4, 5, 6])
    asyn.reset_arg()
    asyn.step_async(a)
    r3 = asyn.step_wait()
    np.testing.assert_allclose(r1[0]["state"], r3[0]["state"], rtol=1e-6)
    np.testing.assert_allclose(r1[1], r3[1], rtol=1e-6)
    asyn.close()


def test_make_async_dummy_factory():
    venv = make_async(
        "dummy",
        env_type="dummy",
        num_envs=3,
        asynchronous=False,
        max_episode_steps=20,
        wrappers={
            "dummy_lowdim": {"obs_dim": OBS, "action_dim": ACT},
            "multi_step": {
                "n_obs_steps": 1,
                "n_action_steps": 2,
                "reset_within_step": True,
            },
        },
        obs_dim=OBS,
        action_dim=ACT,
    )
    venv.seed([0, 1, 2])
    obs = venv.reset_arg()
    assert obs["state"].shape == (3, 1, OBS)
    obs, rew, term, trunc, infos = venv.step(np.zeros((3, 2, ACT)))
    assert np.all(rew > 0)


def test_furniture_gated():
    with pytest.raises(NotImplementedError):
        make_async("one_leg", env_type="furniture", num_envs=2)


def test_split_phase_guards():
    """Pending-state guards: double step_async and bare step_wait raise, and
    other commands are rejected while a step reply is in flight."""
    import pytest

    a = np.zeros((4, 2, ACT), np.float32)
    sync = SyncVectorEnv([_env_fn for _ in range(4)])
    sync.seed([0, 1, 2, 3])
    sync.reset_arg()
    with pytest.raises(RuntimeError):
        sync.step_wait()
    sync.step_async(a)
    with pytest.raises(RuntimeError):
        sync.step_async(a)
    sync.step_wait()

    asyn = AsyncVectorEnv([_env_fn for _ in range(4)], n_workers=2)
    asyn.seed([0, 1, 2, 3])
    asyn.reset_arg()
    with pytest.raises(RuntimeError):
        asyn.step_wait()
    asyn.step_async(a)
    with pytest.raises(RuntimeError):
        asyn.step_async(a)
    with pytest.raises(RuntimeError):
        asyn.reset_arg()
    with pytest.raises(RuntimeError):
        asyn.reset_one_arg(0)
    asyn.step_wait()  # protocol still in sync after the rejected calls
    obs = asyn.reset_arg()
    assert obs["state"].shape[0] == 4
    asyn.close()
