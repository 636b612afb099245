"""Device-resident stitched-trajectory datasets.

Capability parity with `agent/dataset/sequence.py`:
  - StitchedSequenceDataset:25 — flat stitched npz/pkl format (`states`,
    `actions`, optional `images`/`points`, `traj_lengths`), an index table of
    (start, n_before_start) pairs (:175-188), obs-history edge padding
    (:124-173), train/val split (:190).
  - StitchedSequenceQLearningDataset:204 — adds rewards/dones, next-obs
    windows, truncation-aware index skipping (:272-289), optional discounted
    reward-to-go (:251-270).

TPU-native design: the whole dataset lives on device as jnp arrays; batches
are pure gathers `get_batch(idx)` computed from precomputed integer index
tables, so an entire training epoch can run as one `lax.scan` over shuffled
minibatch indices with zero host involvement. Normalization follows upstream
semantics (applied during preprocessing, stats shipped as an explicit
artifact) rather than the fork's load-time normalization.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class Batch(NamedTuple):
    actions: jnp.ndarray  # (B, Ta, Da)
    conditions: dict  # {"state": (B, To, Do), "rgb"?: ..., "point"?: ...}


class Transition(NamedTuple):
    actions: jnp.ndarray
    conditions: dict
    rewards: jnp.ndarray
    dones: jnp.ndarray


class TransitionWithReturn(NamedTuple):
    actions: jnp.ndarray
    conditions: dict
    rewards: jnp.ndarray
    dones: jnp.ndarray
    reward_to_gos: jnp.ndarray


def _load_raw(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=False))
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    raise ValueError(f"unsupported dataset format: {path}")


class StitchedSequenceDataset:
    def __init__(
        self,
        dataset_path: str,
        horizon_steps: int = 64,
        cond_steps: int = 1,
        img_cond_steps: int = 1,
        max_n_episodes: int = 10000,
        use_img: bool = False,
        use_point: bool = False,
        device: Optional[str] = None,  # config parity; data lives on device
        norms_path: Optional[str] = None,  # accepted, unused (upstream semantics)
        **kwargs,
    ):
        assert img_cond_steps <= cond_steps
        self.horizon_steps = horizon_steps
        self.cond_steps = cond_steps
        self.img_cond_steps = img_cond_steps
        self.use_img = use_img
        self.use_point = use_point
        self.device = "jax"

        dataset = _load_raw(dataset_path)
        traj_lengths = np.asarray(dataset["traj_lengths"])[:max_n_episodes]
        total = int(np.sum(traj_lengths))
        self._set_dones_for_indices(dataset, total)
        starts, num_before = self.make_indices(traj_lengths, horizon_steps)
        self.starts = jnp.asarray(starts, dtype=jnp.int32)
        self.num_before = jnp.asarray(num_before, dtype=jnp.int32)
        self.states = jnp.asarray(dataset["states"][:total], dtype=jnp.float32)
        self.actions = jnp.asarray(dataset["actions"][:total], dtype=jnp.float32)
        if use_img:
            self.images = jnp.asarray(dataset["images"][:total])
        if use_point:
            self.points = jnp.asarray(dataset["points"][:total])

    def _set_dones_for_indices(self, dataset, total):  # hook for QL subclass
        pass

    def make_indices(self, traj_lengths, horizon_steps):
        starts, num_before = [], []
        cur = 0
        for L in traj_lengths:
            max_start = cur + int(L) - horizon_steps
            for i in range(cur, max_start + 1):
                starts.append(i)
                num_before.append(i - cur)
            cur += int(L)
        return np.asarray(starts), np.asarray(num_before)

    def __len__(self):
        return int(self.starts.shape[0])

    # ---- bulk-array access for jit-argument threading ----
    # closing a jitted epoch over the dataset arrays inlines them into the
    # serialized HLO (hundreds of MB for pixel datasets — the axon tunnel
    # rejects such compile payloads with HTTP 413). Callers thread
    # `arrays()` through jit as a real argument and `swap_arrays` the
    # tracers in during tracing (agents/pretrain_diffusion.py).
    _BULK_FIELDS = ("states", "actions", "images", "points")

    def arrays(self) -> dict:
        return {
            k: getattr(self, k)
            for k in self._BULK_FIELDS
            if hasattr(self, k)
        }

    def swap_arrays(self, data: dict) -> dict:
        saved = {k: getattr(self, k) for k in data}
        for k, v in data.items():
            setattr(self, k, v)
        return saved

    # ---- pure, jittable batch gather ----
    def _cond_state_indices(self, s, nb):
        """Global indices of the stacked obs history (edge-padded at episode
        start): position j of To holds state[start - min(To-1-j, nb)]."""
        t_off = jnp.arange(self.cond_steps - 1, -1, -1, dtype=jnp.int32)  # (To,)
        return s[:, None] - jnp.minimum(t_off[None, :], nb[:, None])

    def get_batch(self, idx: jnp.ndarray) -> Batch:
        s = self.starts[idx]
        nb = self.num_before[idx]
        act_idx = s[:, None] + jnp.arange(self.horizon_steps, dtype=jnp.int32)
        actions = self.actions[act_idx]
        conditions = {"state": self.states[self._cond_state_indices(s, nb)]}
        if self.use_img:
            img_off = jnp.arange(self.img_cond_steps - 1, -1, -1, dtype=jnp.int32)
            img_idx = s[:, None] - jnp.minimum(img_off[None, :], nb[:, None])
            conditions["rgb"] = self.images[img_idx]
        if self.use_point:
            pnt_off = jnp.arange(self.img_cond_steps - 1, -1, -1, dtype=jnp.int32)
            pnt_idx = s[:, None] - jnp.minimum(pnt_off[None, :], nb[:, None])
            conditions["point"] = self.points[pnt_idx]
        return Batch(actions, conditions)

    def set_train_val_split(self, train_split: float, rng=None):
        """Split the index table; returns the held-out (val) index arrays."""
        n = len(self)
        n_train = int(n * train_split)
        rng = rng if rng is not None else jax.random.key(0)
        perm = jax.random.permutation(rng, n)
        train_idx, val_idx = perm[:n_train], perm[n_train:]
        val = (self.starts[val_idx], self.num_before[val_idx])
        self.starts = self.starts[train_idx]
        self.num_before = self.num_before[train_idx]
        return val

    def set_indices(self, indices):
        self.starts, self.num_before = indices


class StitchedSequenceQLearningDataset(StitchedSequenceDataset):
    def __init__(
        self,
        dataset_path: str,
        max_n_episodes: int = 10000,
        discount_factor: float = 1.0,
        get_mc_return: bool = False,
        **kwargs,
    ):
        self.discount_factor = discount_factor
        self.get_mc_return = get_mc_return
        super().__init__(
            dataset_path=dataset_path, max_n_episodes=max_n_episodes, **kwargs
        )
        dataset = _load_raw(dataset_path)
        traj_lengths = np.asarray(dataset["traj_lengths"])[:max_n_episodes]
        total = int(np.sum(traj_lengths))
        self.rewards = jnp.asarray(dataset["rewards"][:total], dtype=jnp.float32)
        self.dones = jnp.asarray(
            dataset["terminals"][:total], dtype=jnp.float32
        )
        if get_mc_return:
            r = np.asarray(dataset["rewards"][:total], dtype=np.float32)
            rtg = np.zeros_like(r)
            prev_end = 0
            for L in traj_lengths:
                end = prev_end + int(L)
                acc = 0.0
                for t in range(end - 1, prev_end - 1, -1):
                    acc = r[t] + discount_factor * acc
                    rtg[t] = acc
                prev_end = end
            self.reward_to_go = jnp.asarray(rtg)

    def _set_dones_for_indices(self, dataset, total):
        self._dones_np = np.asarray(dataset["terminals"][:total]).astype(bool)

    def make_indices(self, traj_lengths, horizon_steps):
        """Skip the final step of truncated episodes (no valid next state)."""
        starts, num_before = [], []
        cur = 0
        for L in traj_lengths:
            max_start = cur + int(L) - horizon_steps
            if not self._dones_np[cur + int(L) - 1]:
                max_start -= 1
            for i in range(cur, max_start + 1):
                starts.append(i)
                num_before.append(i - cur)
            cur += int(L)
        return np.asarray(starts), np.asarray(num_before)

    def get_batch(self, idx: jnp.ndarray):
        s = self.starts[idx]
        nb = self.num_before[idx]
        act_idx = s[:, None] + jnp.arange(self.horizon_steps, dtype=jnp.int32)
        actions = self.actions[act_idx]
        state_idx = self._cond_state_indices(s, nb)
        n_total = self.states.shape[0]
        next_idx = jnp.minimum(state_idx + self.horizon_steps, n_total - 1)
        conditions = {
            "state": self.states[state_idx],
            "next_state": self.states[next_idx],
        }
        if self.use_img:
            img_off = jnp.arange(self.img_cond_steps - 1, -1, -1, dtype=jnp.int32)
            img_idx = s[:, None] - jnp.minimum(img_off[None, :], nb[:, None])
            conditions["rgb"] = self.images[img_idx]
        rewards = self.rewards[s][:, None]
        dones = self.dones[s][:, None]
        if self.get_mc_return:
            return TransitionWithReturn(
                actions, conditions, rewards, dones, self.reward_to_go[s][:, None]
            )
        return Transition(actions, conditions, rewards, dones)
