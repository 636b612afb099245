"""Checkpointing.

Two layers:

1. Lightweight single-file policy checkpoints (pickle of numpy pytrees) for
   cross-phase handoff — the analog of the reference's `torch.save` state
   dicts (`agent/pretrain/train_agent.py:146-168`,
   `agent/finetune/train_agent.py:125-145`): pretrain saves
   ``{epoch, model, ema}``; finetune saves ``{itr, model}``.
2. Full train-state checkpoints via orbax (params, EMA, optimizer states,
   schedules, RNG, iteration) for exact resume — strictly more capable than
   the reference, which can only restart from policy weights.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, data: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(data), f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


# ---- full train-state resume (orbax) ----
#
# The state is stored as an indexed leaf list plus auxiliary scalars, and
# re-assembled against the live tree structure on restore. Storing leaves
# (rather than the pytree itself) keeps restore independent of how orbax
# round-trips container types (NamedTuples come back as dicts, whose
# alphabetical leaf order need not match field order).


def save_train_state(ckpt_dir: str, step: int, state: Any, aux: dict | None = None) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state)
    payload = {"leaves": {f"{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}}
    if aux:
        payload["aux"] = _to_numpy(aux)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(ckpt_dir, f"step_{step}"), payload, force=True)


def load_train_state(ckpt_dir: str, step: int, target: Any):
    """Restore into the structure of `target`; returns (state, aux)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(
        os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    )
    leaves = [payload["leaves"][k] for k in sorted(payload["leaves"])]
    treedef = jax.tree_util.tree_structure(target)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, payload.get("aux", {})
