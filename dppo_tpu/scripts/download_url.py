"""Dataset / checkpoint acquisition registry.

Parity surface for `script/download_url.py` (617 LoC of per-task Google
Drive URL tables consumed by `run.py:48-78` for lazy auto-download). This
build targets zero-egress TPU hosts, so the registry resolves to LOCAL
generation recipes instead of remote URLs; hosts with egress can still
register URLs via `register_url`.
"""

from __future__ import annotations

from typing import Optional

_URLS: dict[tuple[str, str], str] = {}  # (kind, task) -> url


def register_url(kind: str, task: str, url: str) -> None:
    _URLS[(kind, task)] = url


def _lookup(kind: str, task: str) -> Optional[str]:
    return _URLS.get((kind, task))


_RECIPES = {
    "dataset": (
        "generate demos locally: "
        "dppo_tpu.data.synthetic.collect_gym_demos(<gym env id>, train_npz, "
        "normalization_npz) for gym tasks; "
        "dppo_tpu.scripts.process_robomimic_dataset for robomimic HDF5 demos; "
        "dppo_tpu.data.d3il_dataset.to_stitched_npz for D3IL pickles"
    ),
    "normalization": (
        "normalization.npz is emitted alongside the dataset by every "
        "generator/converter above"
    ),
    "checkpoint": (
        "pretrain locally: python -m dppo_tpu.run --config "
        "cfg/<env>/pretrain/<task>/<cfg>.yaml"
    ),
}


def _get(kind: str, task: str) -> str:
    url = _lookup(kind, task)
    if url is not None:
        return url
    raise LookupError(
        f"No download URL registered for {kind}/{task}. This environment has "
        f"no egress; {_RECIPES[kind]}."
    )


def _task_name(cfg) -> str:
    """Pretrain cfgs use `env: <name>`; finetune cfgs use `env_name` with
    `env:` as a section."""
    name = cfg.get("env_name")
    if name is None:
        env = cfg.get("env")
        name = env if isinstance(env, str) else (env or {}).get("name")
    return str(name or "unknown")


def get_dataset_download_url(cfg) -> str:
    """Parity: download_url.py:1 (keyed by the task name)."""
    return _get("dataset", _task_name(cfg))


def get_normalization_download_url(cfg) -> str:
    """Parity: download_url.py:71."""
    return _get("normalization", _task_name(cfg))


def get_checkpoint_download_url(cfg) -> str:
    """Parity: download_url.py:141."""
    return _get("checkpoint", _task_name(cfg))
