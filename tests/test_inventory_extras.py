"""Tests for inventory-completion pieces: D3IL loaders, LinearNormalizer,
furniture wrapper math, download registry, full-state resume."""

import os
import pickle

import numpy as np
import pytest

from dppo_tpu.data.d3il_dataset import (
    AvoidingDataset,
    to_stitched_npz,
)
from dppo_tpu.envs.furniture_normalizer import LinearNormalizer
from dppo_tpu.envs.wrappers.furniture import (
    proprioceptive_quat_to_6d_rotation,
    stack_last_n_obs_dict,
)


def _make_avoiding_pickles(tmp_path, n=3, T=30):
    rng = np.random.default_rng(0)
    d = tmp_path / "demos"
    d.mkdir()
    for i in range(n):
        env_state = {
            "robot": {
                "des_c_pos": rng.standard_normal((T, 3)).astype(np.float32),
                "c_pos": rng.standard_normal((T, 3)).astype(np.float32),
            }
        }
        with open(d / f"env_{i}.pkl", "wb") as f:
            pickle.dump(env_state, f)
    return str(d)


def test_avoiding_dataset_and_conversion(tmp_path):
    d = _make_avoiding_pickles(tmp_path)
    ds = AvoidingDataset(d, obs_dim=4, action_dim=2, max_len_data=64,
                         window_size=4)
    assert ds.num_data == 3
    assert ds.get_seq_length(0) == 29  # T-1 velocity actions
    obs, act, mask = ds[0]
    assert obs.shape == (4, 4) and act.shape == (4, 2)
    assert mask.sum() == 4
    assert ds.get_all_actions().shape == (3 * 29, 2)

    out = to_stitched_npz(
        ds, str(tmp_path / "train.npz"), str(tmp_path / "norm.npz")
    )
    data = np.load(out)
    assert data["states"].shape == (87, 4)
    assert list(data["traj_lengths"]) == [29, 29, 29]
    norm = np.load(str(tmp_path / "norm.npz"))
    assert norm["obs_min"].shape == (4,)
    # normalized into [-1, 1]
    assert data["states"].min() >= -1.0 - 1e-6
    assert data["states"].max() <= 1.0 + 1e-6

    # the stitched npz must load into the standard dataset
    from dppo_tpu.data.sequence import StitchedSequenceDataset

    sd = StitchedSequenceDataset(out, horizon_steps=4, cond_steps=1)
    import jax.numpy as jnp

    batch = sd.get_batch(jnp.arange(4))
    assert batch.actions.shape == (4, 4, 2)


def test_linear_normalizer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((100, 5)).astype(np.float32)
    data[:, 3] = 2.0  # constant column
    norm = LinearNormalizer()
    norm.fit({"observations": data})
    n = norm(data, "observations", forward=True)
    assert np.abs(n[:, :3]).max() <= 1.0 + 1e-6
    back = norm(n, "observations", forward=False)
    np.testing.assert_allclose(back, data, rtol=1e-5, atol=1e-6)
    # persistence
    p = str(tmp_path / "norm.pkl")
    norm.save(p)
    norm2 = LinearNormalizer.from_file(p)
    np.testing.assert_allclose(
        norm2(data, "observations"), n, rtol=1e-6
    )
    # torch-style flat state dict
    norm3 = LinearNormalizer()
    norm3.load_state_dict(
        {
            "stats.actions.min": np.zeros(2),
            "stats.actions.max": np.ones(2),
        }
    )
    np.testing.assert_allclose(
        norm3(np.array([0.5, 0.5]), "actions"), [0.0, 0.0]
    )


def test_quat_to_6d():
    # identity quaternion (xyzw) -> identity rotation columns
    rs = np.array([[1.0, 2.0, 3.0, 0, 0, 0, 1, 9.0]])
    out = proprioceptive_quat_to_6d_rotation(rs)
    np.testing.assert_allclose(out[0, :3], [1, 2, 3])
    np.testing.assert_allclose(out[0, 3:9], [1, 0, 0, 0, 1, 0], atol=1e-7)
    np.testing.assert_allclose(out[0, 9], 9.0)


def test_stack_last_n_obs_dict_pads():
    obs = [{"a": np.ones((2, 3))}]
    out = stack_last_n_obs_dict(obs, 3)
    assert out["a"].shape == (2, 3, 3)
    np.testing.assert_allclose(out["a"][:, 0], out["a"][:, 2])


def test_download_registry_gives_recipes():
    from dppo_tpu.config import Config
    from dppo_tpu.scripts import download_url as du

    cfg = Config({"env": "hopper-medium-v2"})
    with pytest.raises(LookupError, match="collect_gym_demos"):
        du.get_dataset_download_url(cfg)
    du.register_url("dataset", "hopper-medium-v2", "https://example/x.npz")
    assert du.get_dataset_download_url(cfg).startswith("https://")
    del du._URLS[("dataset", "hopper-medium-v2")]


def test_dppo_full_state_resume(tmp_path):
    from tests.test_finetune_dppo import _cfg
    from dppo_tpu.config import get_class

    cfg = _cfg(tmp_path, n_itr=2)
    cfg.train.save_model_freq = 1
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    # resume from itr 1 and run one more iteration
    cfg2 = _cfg(tmp_path, n_itr=3)
    cfg2.train.save_model_freq = 1
    cfg2.train.resume_itr = 1
    agent2 = get_class(cfg2._target_)(cfg2)
    assert agent2.itr == 2
    import jax

    leaves1 = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    leaves2 = jax.tree_util.tree_leaves(agent2.update_state.params.actor_ft)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    agent2.run()
    assert agent2.itr == 3


def test_dppo_full_state_resume_orbax(tmp_path):
    """Same exact-resume contract via the orbax directory format
    (train.ckpt_format=orbax, SURVEY §5.4 TPU plan)."""
    from tests.test_finetune_dppo import _cfg
    from dppo_tpu.config import get_class

    cfg = _cfg(tmp_path, n_itr=2)
    cfg.train.save_model_freq = 1
    cfg.train.ckpt_format = "orbax"
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert os.path.isdir(
        os.path.join(agent.checkpoint_dir, "full_state", "step_1")
    )
    cfg2 = _cfg(tmp_path, n_itr=3)
    cfg2.train.save_model_freq = 1
    cfg2.train.ckpt_format = "orbax"
    cfg2.train.resume_itr = 1
    agent2 = get_class(cfg2._target_)(cfg2)
    assert agent2.itr == 2
    import jax

    # every leaf of the full train state must round-trip exactly
    leaves1 = jax.tree_util.tree_leaves(agent.update_state)
    leaves2 = jax.tree_util.tree_leaves(agent2.update_state)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    agent2.run()
    assert agent2.itr == 3


def test_filter_d3il_avoid_modes(tmp_path):
    """Mode filtering keeps only trajectories passing desired gaps."""
    from dppo_tpu.scripts.filter_d3il_avoid_data import check_mode, make_dataset

    # synthetic avoid demos: straight vertical lines at distinct x positions
    d = tmp_path / "demos"
    d.mkdir()
    xs = [0.42, 0.5, 0.58]  # left-of-L1, center (through L2 middle), right
    T = 40
    for i, x in enumerate(xs):
        ys = np.linspace(-0.3, 0.45, T)
        des = np.stack([np.full(T, x), ys, np.zeros(T)], axis=1)
        env_state = {"robot": {"des_c_pos": des.astype(np.float32),
                               "c_pos": des.astype(np.float32)}}
        with open(d / f"env_{i}.pkl", "wb") as f:
            pickle.dump(env_state, f)

    # mode 0 = passes level-1 left of the pillar
    enc = check_mode(np.array([0.42, -0.1]))
    assert enc[0] == 1 and enc[1] == 0

    chosen = make_dataset(
        str(d), str(tmp_path / "out"), desired_modes=[0], avoid_modes=[3]
    )
    assert len(chosen) == 1  # only the left trajectory
    data = np.load(str(tmp_path / "out" / "train.npz"))
    assert data["traj_lengths"].shape == (1,)


def _box(rng, T, quat=True):
    d = {"pos": rng.standard_normal((T, 3)).astype(np.float32)}
    if quat:
        q = rng.standard_normal((T, 4)).astype(np.float32)
        d["quat"] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return d


def _make_task_pickles(tmp_path, env_type, n=3, T=20):
    rng = np.random.default_rng(1)
    d = tmp_path / f"demos_{env_type}"
    d.mkdir()
    for i in range(n):
        robot = {
            "des_c_pos": rng.standard_normal((T, 3)).astype(np.float32),
            "c_pos": rng.standard_normal((T, 3)).astype(np.float32),
            "des_j_pos": rng.standard_normal((T, 7)).astype(np.float32),
            "gripper_width": rng.uniform(0, 0.1, T).astype(np.float32),
        }
        env_state = {"robot": robot}
        for name in ("push-box", "target-box", "red-box", "green-box",
                     "blue-box", "red-box1", "blue-box1"):
            env_state[name] = _box(rng, T)
        with open(d / f"env_{i}.pkl", "wb") as f:
            pickle.dump(env_state, f)
    return str(d)


@pytest.mark.parametrize("env_type,obs_dim,action_dim", [
    ("align", 20, 3),
    ("avoid", 4, 2),
    ("push", 10, 2),
    ("sort", 10, 2),
    ("stack", 20, 8),
])
def test_process_d3il_dataset_all_tasks(tmp_path, env_type, obs_dim,
                                        action_dim):
    from dppo_tpu.scripts.process_d3il_dataset import make_dataset

    d = _make_task_pickles(tmp_path, env_type)
    out = tmp_path / f"out_{env_type}"
    make_dataset(d, str(out), f"{env_type}-", env_type, val_split=0.2)

    train = np.load(out / f"{env_type}-train.npz")
    val = np.load(out / f"{env_type}-val.npz")
    norm = np.load(out / f"{env_type}-normalization.npz")
    assert train["states"].shape[1] == obs_dim
    assert train["actions"].shape[1] == action_dim
    assert norm["obs_min"].shape == (obs_dim,)
    # by-trajectory split: 3 trajs -> 2 train / 1 val
    assert len(train["traj_lengths"]) == 2 and len(val["traj_lengths"]) == 1
    assert train["states"].shape[0] == int(train["traj_lengths"].sum())
    # everything scaled into [-1, 1]
    for arr in (train["states"], train["actions"]):
        assert arr.min() >= -1 - 1e-5 and arr.max() <= 1 + 1e-5
    # loadable by the training dataset
    from dppo_tpu.data.sequence import StitchedSequenceDataset

    seq = StitchedSequenceDataset(
        str(out / f"{env_type}-train.npz"), horizon_steps=4, cond_steps=1,
        max_n_episodes=10,
    )
    batch = seq.get_batch(np.array([0, 1]))
    assert batch.actions.shape == (2, 4, action_dim)
