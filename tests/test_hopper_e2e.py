"""Full-pipeline integration test on REAL MuJoCo Hopper (gymnasium):
collect demos -> pretrain -> DPPO fine-tune -> eval, all through the
shipped cfg/ tree with overrides."""

import os

import numpy as np
import pytest

from dppo_tpu.config import get_class, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def hopper_data(tmp_path_factory):
    pytest.importorskip("gymnasium")
    pytest.importorskip("mujoco")
    from dppo_tpu.data.synthetic import collect_gym_demos

    root = tmp_path_factory.mktemp("hopper")
    data = str(root / "train.npz")
    norm = str(root / "normalization.npz")
    collect_gym_demos("Hopper-v4", data, norm, n_episodes=4, max_steps=60)
    return {"root": str(root), "data": data, "norm": norm}


def test_hopper_pretrain_finetune_eval(hopper_data, monkeypatch):
    monkeypatch.setenv("DPPO_LOG_DIR", hopper_data["root"])
    monkeypatch.setenv("DPPO_DATA_DIR", hopper_data["root"])

    # ---- pretrain (tiny) ----
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/pretrain/hopper-medium-v2/pre_diffusion_mlp.yaml"),
        overrides=[
            f"train_dataset_path={hopper_data['data']}",
            f"logdir={hopper_data['root']}/pre",
            "train.n_epochs=3",
            "train.save_model_freq=3",
            "train.batch_size=32",
            "denoising_steps=8",
            "model.denoising_steps=8",
            "model.network.mlp_dims=[64, 64, 64]",
            "model.network.time_dim=8",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    ckpt = f"{hopper_data['root']}/pre/checkpoint/state_3.pkl"
    assert os.path.exists(ckpt)

    # ---- DPPO fine-tune on real MuJoCo ----
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml"),
        overrides=[
            f"base_policy_path={ckpt}",
            f"normalization_path={hopper_data['norm']}",
            f"logdir={hopper_data['root']}/ft",
            "env.n_envs=4",
            "env.max_episode_steps=40",
            "train.n_train_itr=2",
            "train.n_steps=6",
            "train.batch_size=64",
            "train.update_epochs=1",
            "train.val_freq=10",
            "train.save_model_freq=1",
            "denoising_steps=8",
            "ft_denoising_steps=4",
            "model.denoising_steps=8",
            "model.ft_denoising_steps=4",
            "model.actor.mlp_dims=[64, 64, 64]",
            "model.actor.time_dim=8",
            "model.critic.mlp_dims=[64, 64, 64]",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    import pickle

    with open(f"{hopper_data['root']}/ft/result.pkl", "rb") as f:
        results = pickle.load(f)
    assert len(results) == 2
    ft_ckpt = f"{hopper_data['root']}/ft/checkpoint/state_1.pkl"
    assert os.path.exists(ft_ckpt)

    # ---- eval the fine-tuned policy ----
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/eval/hopper-v2/eval_diffusion_mlp.yaml"),
        overrides=[
            f"base_policy_path={ft_ckpt}",
            f"normalization_path={hopper_data['norm']}",
            f"logdir={hopper_data['root']}/eval",
            "env.n_envs=2",
            "env.max_episode_steps=20",
            "n_steps=8",
            "denoising_steps=8",
            "ft_denoising_steps=4",
            "model.denoising_steps=8",
            "model.ft_denoising_steps=4",
            "model.network.mlp_dims=[64, 64, 64]",
            "model.network.time_dim=8",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    out = agent.run()
    assert os.path.exists(f"{hopper_data['root']}/eval/result.npz")
    assert np.isfinite(out["eval_episode_reward"])
