"""Linear min/max→[-1,1] normalizer for batched-GPU-env observations.

Parity with `env/gym_utils/furniture_normalizer.py:11` (LinearNormalizer):
per-key min/max stats with constant-column widening, forward/backward
transforms. Stored as plain numpy dicts (the reference stores them as an
nn.ParameterDict state-dict); `load_state_dict` accepts either our pickle
layout or a torch-style flat dict of `stats.<key>.<min|max>` tensors.
"""

from __future__ import annotations

import pickle
from typing import Mapping

import numpy as np


class LinearNormalizer:
    def __init__(self):
        self.stats: dict[str, dict[str, np.ndarray]] = {}

    def fit(self, data_dict: Mapping[str, np.ndarray]):
        for key, arr in data_dict.items():
            arr = np.asarray(arr)
            min_value = arr.min(axis=0)
            max_value = arr.max(axis=0)
            constant = (max_value - min_value) == 0
            min_value = np.where(constant, min_value - 1, min_value)
            max_value = np.where(constant, max_value + 1, max_value)
            self.stats[key] = {"min": min_value, "max": max_value}

    def __call__(self, x, key: str, forward: bool = True):
        s = self.stats[key]
        if forward:
            return 2 * (x - s["min"]) / (s["max"] - s["min"]) - 1
        return (x + 1) / 2 * (s["max"] - s["min"]) + s["min"]

    # ---- persistence ----
    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.stats, f)

    def load_state_dict(self, state_dict):
        if isinstance(state_dict, dict) and all(
            isinstance(v, dict) for v in state_dict.values()
        ):
            self.stats = {
                k: {kk: np.asarray(vv) for kk, vv in v.items()}
                for k, v in state_dict.items()
            }
            return
        # torch-style flat dict: "stats.<key>.<min|max>"
        for name, tensor in state_dict.items():
            parts = name.split(".")
            key, stat = parts[-2], parts[-1]
            self.stats.setdefault(key, {})[stat] = np.asarray(tensor)

    @classmethod
    def from_file(cls, path: str) -> "LinearNormalizer":
        with open(path, "rb") as f:
            data = pickle.load(f)
        norm = cls()
        norm.load_state_dict(data)
        return norm
