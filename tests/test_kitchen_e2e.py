"""Franka Kitchen (gymnasium-robotics) end-to-end: the 4th gym benchmark
family (SURVEY §2: d4rl kitchen-{complete,partial,mixed}-v0). Drives demo
collection -> BC pretrain -> DPPO fine-tune on the REAL FrankaKitchen sim
through the shipped cfg tree, exercising the d4rl task-set mapping and the
goal-env dict-observation flattening."""

import os

import numpy as np
import pytest

from dppo_tpu.config import get_class, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def kitchen_data(tmp_path_factory):
    pytest.importorskip("gymnasium")
    pytest.importorskip("gymnasium_robotics")
    pytest.importorskip("mujoco")
    from dppo_tpu.data.synthetic import collect_gym_demos

    root = tmp_path_factory.mktemp("kitchen")
    data = str(root / "train.npz")
    norm = str(root / "normalization.npz")
    collect_gym_demos(
        "kitchen-complete-v0", data, norm, n_episodes=3, max_steps=30
    )
    arr = np.load(data)
    assert arr["states"].shape[1] == 59
    assert arr["actions"].shape[1] == 9
    return {"root": str(root), "data": data, "norm": norm}


def test_kitchen_task_mapping():
    from dppo_tpu.envs.wrappers.mujoco_locomotion import resolve_env_spec

    for name, burner in [
        ("kitchen-complete-v0", False),
        ("kitchen-partial-v0", False),
        ("kitchen-mixed-v0", True),
    ]:
        env_id, kwargs = resolve_env_spec(name)
        assert env_id == "FrankaKitchen-v1"
        tasks = kwargs["tasks_to_complete"]
        assert ("bottom burner" in tasks) == burner
        assert "microwave" in tasks and "kettle" in tasks
    # unknown variants must raise, not silently fall back to default tasks
    for bogus in ["kitchen-v0", "kitchen-bogus-v0"]:
        with pytest.raises(ValueError, match="kitchen variant"):
            resolve_env_spec(bogus)


def test_kitchen_pretrain_finetune(kitchen_data, monkeypatch):
    monkeypatch.setenv("DPPO_LOG_DIR", kitchen_data["root"])
    monkeypatch.setenv("DPPO_DATA_DIR", kitchen_data["root"])

    cfg = load_config(
        os.path.join(
            REPO, "cfg/gym/pretrain/kitchen-complete-v0/pre_diffusion_mlp.yaml"
        ),
        overrides=[
            f"train_dataset_path={kitchen_data['data']}",
            f"logdir={kitchen_data['root']}/pre",
            "train.n_epochs=2",
            "train.save_model_freq=2",
            "train.batch_size=16",
            "denoising_steps=4",
            "model.denoising_steps=4",
            "model.network.mlp_dims=[32, 32, 32]",
            "model.network.time_dim=8",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    ckpt = f"{kitchen_data['root']}/pre/checkpoint/state_2.pkl"
    assert os.path.exists(ckpt)

    cfg = load_config(
        os.path.join(
            REPO, "cfg/gym/finetune/kitchen-complete-v0/ft_ppo_diffusion_mlp.yaml"
        ),
        overrides=[
            f"base_policy_path={ckpt}",
            f"normalization_path={kitchen_data['norm']}",
            f"logdir={kitchen_data['root']}/ft",
            "env.n_envs=2",
            "env.max_episode_steps=12",
            "train.n_train_itr=1",
            "train.n_steps=3",
            "train.batch_size=16",
            "train.update_epochs=1",
            "train.val_freq=10",
            "train.save_model_freq=5",
            "denoising_steps=4",
            "ft_denoising_steps=2",
            "model.denoising_steps=4",
            "model.ft_denoising_steps=2",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.actor.time_dim=8",
            "model.critic.mlp_dims=[32, 32, 32]",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 1
    assert os.path.exists(f"{kitchen_data['root']}/ft/result.pkl")
