"""Native shared-memory observation transport tests."""

import multiprocessing as mp

import numpy as np
import pytest

from dppo_tpu.native import ShmSegment, load_shm_lib

pytestmark = pytest.mark.skipif(
    load_shm_lib() is None, reason="no C++ toolchain for native transport"
)


def test_roundtrip_same_process():
    seg = ShmSegment("/dppo_test_rt", 4 * 16, create=True)
    try:
        data = np.arange(16, dtype=np.float32)
        seg.write(data)
        out = np.empty(16, dtype=np.float32)
        seq = seg.read(out)
        np.testing.assert_array_equal(out, data)
        assert seq == 2  # one completed write
        seg.write(data * 2)
        seg.read(out)
        np.testing.assert_array_equal(out, data * 2)
        assert seg.seq == 4
    finally:
        seg.close()


def _child_writer(name, nbytes, value):
    seg = ShmSegment(name, nbytes, create=False)
    arr = np.full(nbytes // 4, value, dtype=np.float32)
    seg.write(arr)
    seg.close()


def test_cross_process_write():
    nbytes = 4 * 64
    seg = ShmSegment("/dppo_test_xp", nbytes, create=True)
    try:
        ctx = mp.get_context("fork")
        p = ctx.Process(
            target=_child_writer, args=("/dppo_test_xp", nbytes, 7.5)
        )
        p.start()
        p.join()
        out = np.empty(64, dtype=np.float32)
        seg.read(out)
        np.testing.assert_allclose(out, 7.5)
    finally:
        seg.close()


def _env_fn():
    from dppo_tpu.envs.multi_step import MultiStep
    from dppo_tpu.envs.wrappers.dummy import DummyLowdimWrapper

    return MultiStep(
        DummyLowdimWrapper(obs_dim=5, action_dim=2),
        n_obs_steps=2,
        n_action_steps=3,
        max_episode_steps=10,
        reset_within_step=True,
    )


def test_async_vector_env_shm_matches_pipe():
    from dppo_tpu.envs.vector import AsyncVectorEnv
    env_fn = _env_fn

    pipe_env = AsyncVectorEnv([env_fn] * 4, n_workers=2)
    shm_env = AsyncVectorEnv(
        [env_fn] * 4, n_workers=2, use_shm=True, shm_state_shape=(2, 5)
    )
    try:
        pipe_env.seed([5, 6, 7, 8])
        shm_env.seed([5, 6, 7, 8])
        o1 = pipe_env.reset_arg()
        o2 = shm_env.reset_arg()
        np.testing.assert_allclose(o1["state"], o2["state"], rtol=1e-6)
        a = (
            np.random.default_rng(0)
            .standard_normal((4, 3, 2))
            .astype(np.float32)
        )
        for _ in range(4):
            r1 = pipe_env.step(a)
            r2 = shm_env.step(a)
            np.testing.assert_allclose(
                r1[0]["state"], r2[0]["state"], rtol=1e-6
            )
            np.testing.assert_allclose(r1[1], r2[1], rtol=1e-6)
            np.testing.assert_array_equal(r1[2], r2[2])
    finally:
        pipe_env.close()
        shm_env.close()
