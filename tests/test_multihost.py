"""SPMD correctness of the learner over a device mesh.

The reference has no multi-device learner (single `cuda:0`, SURVEY §2.8).
This framework's scale-out contract is: the fused DPPO update consumes
rollout buffers sharded on the env axis of a `data` mesh, and XLA inserts
the collectives (gradient psums + the three global scalar reductions:
running reward variance, advantage mean/std, approx-KL — SURVEY §5.8).
Correctness bar: the sharded update must match the single-device update
numerically — any missed reduction would produce per-shard statistics and
diverge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dppo_tpu.parallel.mesh import make_mesh, replicate, shard_axis
from dppo_tpu.parallel.multihost import host_local_slice


def test_host_local_slice_partitions_evenly(monkeypatch):
    # single-process: identity slice
    s = host_local_slice(10)
    assert (s.start, s.stop) == (0, 10)


def _buffers(E, S=4, Ta=4, K_ft=4, obs_dim=11, action_dim=3):
    rng = np.random.default_rng(0)
    return dict(
        obs_trajs={
            "state": jnp.asarray(
                rng.standard_normal((S, E, 1, obs_dim)), jnp.float32
            )
        },
        chains_trajs=jnp.asarray(
            rng.standard_normal((S, E, K_ft + 1, Ta, action_dim)), jnp.float32
        ),
        reward_trajs=jnp.asarray(rng.standard_normal((S, E)), jnp.float32),
        terminated=jnp.zeros((S, E), jnp.float32),
        firsts=jnp.zeros((S, E), jnp.float32),
        final_obs={
            "state": jnp.asarray(
                rng.standard_normal((E, 1, obs_dim)), jnp.float32
            )
        },
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_update_matches_single_device():
    import __graft_entry__ as g
    from dppo_tpu.agents.finetune_ppo_diffusion import TrainPPODiffusionAgent

    E = 16
    agent = TrainPPODiffusionAgent(g._tiny_cfg(E))
    bufs = _buffers(E)
    key = jax.random.key(1)
    itr = jnp.asarray(0, jnp.int32)

    # single-device reference result
    state0 = agent.update_state
    ref_state, ref_diag = agent._jit_update(
        state0, bufs["obs_trajs"], bufs["chains_trajs"], bufs["reward_trajs"],
        bufs["terminated"], bufs["firsts"], bufs["final_obs"], key, itr,
    )

    # same inputs sharded over an 8-device data mesh
    mesh = make_mesh(8)
    sh = dict(
        obs_trajs={"state": shard_axis(mesh, bufs["obs_trajs"]["state"], 1)},
        chains_trajs=shard_axis(mesh, bufs["chains_trajs"], 1),
        reward_trajs=shard_axis(mesh, bufs["reward_trajs"], 1),
        terminated=shard_axis(mesh, bufs["terminated"], 1),
        firsts=shard_axis(mesh, bufs["firsts"], 1),
        final_obs={"state": shard_axis(mesh, bufs["final_obs"]["state"], 0)},
    )
    state_r = replicate(mesh, state0)
    new_state, diag = agent._jit_update(
        state_r, sh["obs_trajs"], sh["chains_trajs"], sh["reward_trajs"],
        sh["terminated"], sh["firsts"], sh["final_obs"], key, itr,
    )

    for k in ("pg_loss", "v_loss", "approx_kl", "ratio"):
        np.testing.assert_allclose(
            float(diag[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"diagnostic {k} diverged under sharding",
        )
    # updated actor params must match too (gradient reduction correctness)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params.actor_ft)
    new_leaves = jax.tree_util.tree_leaves(new_state.params.actor_ft)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_device_iteration_matches_single_device():
    """The fully-fused device-env iteration (rollout scan + PPO update in
    one program, TPU-resident env) sharded over an 8-device data mesh must
    reproduce the single-device result: env dynamics and RNG draws are
    deterministic by key+shape regardless of sharding, and every learner
    reduction must be global."""
    import __graft_entry__ as g
    from dppo_tpu.agents.finetune_ppo_diffusion_device import (
        TrainPPODiffusionDeviceAgent,
    )

    E = 16
    agent = TrainPPODiffusionDeviceAgent(g._tiny_device_cfg(E))
    pool0 = agent.venv.pool_state
    key = jax.random.key(5)
    itr = jnp.asarray(0, jnp.int32)

    first0 = jnp.ones((E,), jnp.float32)
    ref_state, _, ref_rew, ref_done, ref_diag = agent._jit_iteration(
        agent.update_state, pool0, first0, key, itr
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(
        lambda x: shard_axis(mesh, x, 0), pool0
    )
    state_r = replicate(mesh, agent.update_state)
    new_state, _, rew, done, diag = agent._jit_iteration(
        state_r, pool_sh, first0, key, itr
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    for k in ("pg_loss", "v_loss", "approx_kl", "ratio"):
        np.testing.assert_allclose(
            float(diag[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"diagnostic {k} diverged under sharding",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params.actor_ft),
        jax.tree_util.tree_leaves(new_state.params.actor_ft),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_gaussian_iteration_matches_single_device():
    """The Gaussian-family fused device iteration under the shared mixin:
    sharded over an 8-device data mesh == single-device."""
    import os

    from dppo_tpu.config import get_class, load_config

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_ppo_gaussian_mlp.yaml"),
        overrides=[
            "normalization_path=null",
            "base_policy_path=null",
            "model.network_path=null",
            "env.n_envs=16",
            "env.max_episode_steps=16",
            "train.n_steps=5",
            "train.batch_size=40",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.critic.mlp_dims=[32, 32, 32]",
            "logdir=/tmp/mh_gauss",
            "wandb=null",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    pool0 = agent.venv.pool_state
    key = jax.random.key(5)
    itr = jnp.asarray(0, jnp.int32)

    first0 = jnp.ones((16,), jnp.float32)
    ref_state, _, ref_rew, ref_done, ref_diag = agent._jit_iteration(
        agent.update_state, pool0, first0, key, itr
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(lambda x: shard_axis(mesh, x, 0), pool0)
    state_r = replicate(mesh, agent.update_state)
    new_state, _, rew, done, diag = agent._jit_iteration(
        state_r, pool_sh, first0, key, itr
    )
    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    for k in ("pg_loss", "v_loss", "approx_kl"):
        np.testing.assert_allclose(
            float(diag[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"diagnostic {k} diverged under sharding",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params.actor_ft),
        jax.tree_util.tree_leaves(new_state.params.actor_ft),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_sac_block_matches_single_device():
    """The fused SAC block (env steps + replay inserts + conditional TD
    updates in one program): env axis sharded, learner+replay replicated.
    Exercises that the replay gather and every update reduction is global."""
    import os

    from dppo_tpu.config import get_class, load_config

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/scratch/pendulum-v1/sac_mlp.yaml"),
        overrides=[
            "normalization_path=null",
            "env.n_envs=16",
            "env.max_episode_steps=16",
            "train.n_explore_steps=2",
            "train.batch_size=32",
            "train.buffer_size=256",
            "model.actor.mlp_dims=[32, 32]",
            "model.critic.mlp_dims=[32, 32]",
            "logdir=/tmp/mh_sac",
            "wandb=null",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    pool0 = agent.venv.pool_state
    key1, key2 = jax.random.key(3), jax.random.key(4)

    # fill then update, single-device reference
    fill = agent._jit_block(4, True)
    train = agent._jit_block(4, False)
    st, rp, ps, _, _, _ = fill(
        agent.state, agent.replay, pool0, key1, jnp.asarray(0, jnp.int32)
    )
    ref_st, ref_rp, _, ref_rew, _, ref_diag = train(
        st, rp, ps, key2, jnp.asarray(3, jnp.int32)
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(lambda x: shard_axis(mesh, x, 0), pool0)
    st_r = replicate(mesh, agent.state)
    rp_r = replicate(mesh, agent.replay)
    st, rp, ps, _, _, _ = fill(
        st_r, rp_r, pool_sh, key1, jnp.asarray(0, jnp.int32)
    )
    new_st, new_rp, _, rew, _, diag = train(
        st, rp, ps, key2, jnp.asarray(3, jnp.int32)
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    assert int(new_rp.size) == int(ref_rp.size)
    np.testing.assert_allclose(
        float(diag["loss_critic"]), float(ref_diag["loss_critic"]),
        rtol=2e-4, atol=2e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_st.params),
        jax.tree_util.tree_leaves(new_st.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_awr_iteration_matches_single_device():
    """The fused AWR iteration (rollout + device-resident FIFO window
    insert + TD(λ) + weighted-regression updates in one program): env axis
    sharded, learner + window replicated."""
    import os

    from dppo_tpu.config import get_class, load_config

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_awr_diffusion_mlp.yaml"),
        overrides=[
            "normalization_path=null",
            "base_policy_path=null",
            "model.network_path=null",
            "env.n_envs=16",
            "env.max_episode_steps=16",
            "train.n_steps=4",
            "train.batch_size=32",
            "train.buffer_size=128",
            "train.replay_ratio=8",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.actor.time_dim=8",
            "model.critic.mlp_dims=[32, 32, 32]",
            "denoising_steps=4",
            "logdir=/tmp/mh_awr",
            "wandb=null",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    pool0 = agent.venv.pool_state
    key = jax.random.key(7)
    itr = jnp.asarray(1, jnp.int32)

    ref_state, ref_win, _, ref_rew, ref_done, ref_losses = agent._jit_iteration(
        agent.state, agent.window, pool0, key, itr
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(lambda x: shard_axis(mesh, x, 0), pool0)
    state_r = replicate(mesh, agent.state)
    win_r = replicate(mesh, agent.window)
    new_state, new_win, _, rew, done, losses = agent._jit_iteration(
        state_r, win_r, pool_sh, key, itr
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    assert int(new_win.filled) == int(ref_win.filled)
    for name, a, b in zip(("actor", "critic"), ref_losses, losses):
        np.testing.assert_allclose(
            float(b), float(a), rtol=2e-4, atol=2e-5,
            err_msg=f"loss_{name} diverged under sharding",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_calql_block_matches_single_device(tmp_path):
    """The fused Cal-QL block (rollout window + reward-to-go + replay flush
    + mixed offline/online updates): env axis sharded, learner + replay +
    offline dataset replicated."""
    import os

    from dppo_tpu.config import get_class, load_config
    from dppo_tpu.data.synthetic import make_synthetic_dataset

    ds = str(tmp_path / "offline.npz")
    make_synthetic_dataset(
        ds, n_episodes=4, traj_length=30, obs_dim=3, action_dim=1,
        with_rewards=True,
    )
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/calql_mlp_online.yaml"),
        overrides=[
            "normalization_path=null",
            f"offline_dataset_path={ds}",
            "env.n_envs=16",
            "env.max_episode_steps=16",
            "train.n_steps=2",
            "train.num_update=2",
            "train.batch_size=32",
            "train.buffer_size=256",
            "model.actor.mlp_dims=[32, 32]",
            "model.critic.mlp_dims=[32, 32]",
            "logdir=/tmp/mh_calql",
            "wandb=null",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    roll0 = agent._make_rollout_state(agent.venv.pool_state)
    key = jax.random.key(9)

    train = agent._jit_block(3, False)
    ref_st, ref_rp, _, ref_rew, ref_done, ref_diag = train(
        agent.state, agent.replay, roll0, key, jnp.asarray(0, jnp.int32)
    )

    mesh = make_mesh(8)
    # env-axis-aligned rollout state (pool + pending-episode window) is
    # sharded on the env axis; learner + replay + offline data replicated
    roll_sh = jax.tree_util.tree_map(
        lambda x: shard_axis(mesh, x, 0), roll0
    )
    st_r = replicate(mesh, agent.state)
    rp_r = replicate(mesh, agent.replay)
    new_st, new_rp, _, rew, done, diag = train(
        st_r, rp_r, roll_sh, key, jnp.asarray(0, jnp.int32)
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    assert int(new_rp.size) == int(ref_rp.size)
    for k in ("loss_critic", "loss_actor"):
        np.testing.assert_allclose(
            float(diag[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"diagnostic {k} diverged under sharding",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_st.params),
        jax.tree_util.tree_leaves(new_st.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("name", ["dql", "dipo", "idql", "qsm"])
def test_sharded_fused_offpolicy_iteration_matches_single_device(
    tmp_path, name
):
    """The fused off-policy diffusion iteration (rollout + replay inserts +
    the algorithm's own update in one program, OffPolicyDeviceMixin): env
    axis sharded over an 8-device mesh, learner + replay replicated ==
    single-device. Covers DQL, DIPO (which writes improved actions back
    into the replay ring), IDQL (expectile V + Q critics), and QSM."""
    from dppo_tpu.config import Config, get_class
    from tests.test_offpolicy import (
        _CASES,
        _DEVICE_TARGETS,
        _base_train,
        _device_env_cfg,
        ACT,
        OBS,
    )

    _, model_target, train_extra, model_nets = _CASES[name]
    E = 16
    cfg = Config(
        {
            "_target_": _DEVICE_TARGETS[name],
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": OBS,
            "action_dim": ACT,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _device_env_cfg(n_envs=E),
            "train": _base_train(train_extra),
            "model": Config(
                {
                    "_target_": model_target,
                    "denoised_clip_value": 1.0,
                    "randn_clip_value": 3,
                    "min_sampling_denoising_std": 0.1,
                    "network_path": None,
                    "horizon_steps": 2,
                    "obs_dim": OBS,
                    "action_dim": ACT,
                    "denoising_steps": 6,
                    **model_nets,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    pool0 = agent.venv.pool_state
    key = jax.random.key(11)
    itr = jnp.asarray(1, jnp.int32)

    ref_st, ref_rp, _, ref_rew, ref_done, ref_losses = agent._jit_iteration(
        agent.state, agent.replay, pool0, key, itr
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(lambda x: shard_axis(mesh, x, 0), pool0)
    st_r = replicate(mesh, agent.state)
    rp_r = replicate(mesh, agent.replay)
    new_st, new_rp, _, rew, done, losses = agent._jit_iteration(
        st_r, rp_r, pool_sh, key, itr
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    assert int(new_rp.size) == int(ref_rp.size)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(ref_losses), rtol=2e-4, atol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_st.params),
        jax.tree_util.tree_leaves(new_st.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
    # DIPO rewrites replay actions in its update: ring contents must match
    for k in ref_rp.data:
        np.testing.assert_allclose(
            np.asarray(new_rp.data[k]), np.asarray(ref_rp.data[k]),
            rtol=2e-4, atol=2e-5,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fused_img_iteration_matches_single_device(tmp_path):
    """The fully-fused PIXEL iteration (on-device rendering -> ViT policy
    -> env step -> PPO update with RandomShiftsAug + grad accumulation +
    chunked recompute, one program): env axis sharded over an 8-device
    mesh == single-device. Every aug/bc rng draw is key+shape-determined,
    so sharding must not change a single pixel of the result."""
    from dppo_tpu.config import get_class
    from tests.test_img_device import _pixel_cfg

    E = 16
    cfg = _pixel_cfg(tmp_path, n_envs=E, n_steps=3, n_itr=1)
    agent = get_class(cfg._target_)(cfg)
    agent.venv.reset_arg()
    pool0 = agent.venv.pool_state
    key = jax.random.key(3)
    itr = jnp.asarray(0, jnp.int32)
    first0 = jnp.ones((E,), jnp.float32)

    ref_state, _, ref_rew, ref_done, ref_diag = agent._jit_iteration(
        agent.update_state, pool0, first0, key, itr
    )

    mesh = make_mesh(8)
    pool_sh = jax.tree_util.tree_map(lambda x: shard_axis(mesh, x, 0), pool0)
    state_r = replicate(mesh, agent.update_state)
    new_state, _, rew, done, diag = agent._jit_iteration(
        state_r, pool_sh, first0, key, itr
    )

    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(ref_rew), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref_done))
    for k in ("pg_loss", "v_loss", "approx_kl"):
        np.testing.assert_allclose(
            float(diag[k]), float(ref_diag[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"diagnostic {k} diverged under sharding",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params.actor_ft),
        jax.tree_util.tree_leaves(new_state.params.actor_ft),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
