import os
import textwrap

import pytest

from dppo_tpu.config import (
    apply_overrides,
    instantiate,
    load_config,
    resolve,
    safe_eval,
)


def test_safe_eval_arithmetic():
    assert safe_eval("11 * 1") == 11
    assert safe_eval("round(1000 / 4)") == 250
    assert safe_eval("2 ** 3 + 1") == 9
    assert safe_eval("[1, 2, 3]") == [1, 2, 3]
    assert safe_eval("1 if 2 > 1 else 0") == 1


def test_safe_eval_rejects_code():
    with pytest.raises(Exception):
        safe_eval("__import__('os').system('true')")
    with pytest.raises(Exception):
        safe_eval("open('/etc/passwd')")


def test_interpolation_and_eval(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        textwrap.dedent(
            """
            obs_dim: 11
            cond_steps: 2
            name: run_${obs_dim}
            model:
              cond_dim: ${eval:'${obs_dim} * ${cond_steps}'}
              nested: ${model.cond_dim}
            env:
              max_episode_steps: 1000
            act_steps: 4
            n_steps: ${eval:'round(${env.max_episode_steps} / ${act_steps})'}
            """
        )
    )
    cfg = load_config(str(cfg_file))
    assert cfg.model.cond_dim == 22
    assert cfg.name == "run_11"
    assert cfg.n_steps == 250
    assert cfg.model.nested == 22


def test_env_resolver(tmp_path, monkeypatch):
    monkeypatch.setenv("DPPO_LOG_DIR", "/tmp/logzz")
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("logdir: ${oc.env:DPPO_LOG_DIR}/sub\n")
    cfg = load_config(str(cfg_file))
    assert cfg.logdir == "/tmp/logzz/sub"


def test_overrides(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("a: 1\nb:\n  c: 2\n")
    cfg = load_config(str(cfg_file), overrides=["a=5", "b.c=7", "b.d=hello"])
    assert cfg.a == 5 and cfg.b.c == 7 and cfg.b.d == "hello"


def test_instantiate_with_reference_target():
    node = {
        "_target_": "dppo.model.common.critic.CriticObs",
        "cond_dim": 11,
        "mlp_dims": [32, 32],
        "activation_type": "Mish",
        "residual_style": False,
    }
    critic = instantiate(node)
    from dppo_tpu.nets.critic import CriticObs

    assert isinstance(critic, CriticObs)
    assert critic.cond_dim == 11
