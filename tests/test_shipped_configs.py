"""Every shipped YAML must resolve and its model subtree must instantiate
(and, for runnable-here envs, init parameters). Simulator-gated configs
validate config+model only."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from dppo_tpu.config import instantiate, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "cfg", "**", "*.yaml"), recursive=True)
)


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("DPPO_LOG_DIR", "/tmp/cfee/log")
    monkeypatch.setenv("DPPO_DATA_DIR", "/tmp/cfee/data")
    monkeypatch.setenv("DPPO_WANDB_ENTITY", "nobody")


def test_configs_exist():
    assert len(CONFIGS) >= 10


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS]
)
def test_config_resolves_and_model_instantiates(path):
    cfg = load_config(path, overrides=["model.network_path=null"])
    assert "_target_" in cfg
    model_cfg = cfg.get("model")
    if model_cfg is None:
        return
    model = instantiate(model_cfg)
    assert model is not None
    # init params for state-policy models (no simulator needed)
    obs_dim = cfg.get("obs_dim")
    if obs_dim is None or "shape_meta" in cfg:
        return  # pixel/point models exercised by their own tests
    cond_steps = int(cfg.get("cond_steps", 1))
    cond = {"state": jnp.zeros((2, cond_steps, int(obs_dim)))}
    if hasattr(model, "init_vpg_params"):
        params = model.init_vpg_params(jax.random.key(0), cond)
    elif hasattr(model, "init_params"):
        params = model.init_params(jax.random.key(0), cond=cond)
    else:
        return
    assert params is not None


def test_robomimic_env_meta_jsons_exist_and_load():
    """Every robomimic_env_cfg_path referenced by a shipped config must
    exist and parse (the JSONs are emitted by tools/gen_robomimic_env_meta
    .py at reference parity)."""
    import json

    referenced = set()
    for path in CONFIGS:
        if "/robomimic/" not in path:
            continue
        cfg = load_config(path, overrides=["model.network_path=null"])
        p = cfg.get("robomimic_env_cfg_path")
        if p:
            referenced.add(p)
    assert referenced, "no robomimic config references env_meta"
    for rel in sorted(referenced):
        full = os.path.join(REPO, rel)
        assert os.path.exists(full), f"missing {rel}"
        meta = json.load(open(full))
        assert meta["type"] == 1 and "env_kwargs" in meta
