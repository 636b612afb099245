"""Cross-framework golden parity, part 7: dataset indexing semantics.

Oracle target: the fork's StitchedSequenceDataset
(`agent/dataset/sequence.py:25-190`) — the index table (`make_indices`,
one sample per in-episode window start, with the number of steps before
it inside its episode) and the `__getitem__` windowing: horizon_steps of
actions from the start index, cond_steps of observation history stacked
most-recent-last with EDGE PADDING at episode starts.

The repo deliberately keeps UPSTREAM normalization semantics
(preprocessing-time; PARITY.md known deviation #6) rather than the fork's
load-time stats, so the oracle neutralizes normalization (zero-mean /
unit-std states, [-1, 1] action range, augment_xy=0) — what remains is
exactly the indexing/padding contract both implementations must share.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

try:
    from dppo.agent.dataset.sequence import (
        StitchedSequenceDataset as TorchDataset,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference torch dppo not importable: {e}", allow_module_level=True)

import jax.numpy as jnp

from dppo_tpu.data.sequence import StitchedSequenceDataset

# reference slices states to n_dpc + 9 + n_pc and actions to 9 + n_pc
# (sequence.py:97-103); with n_dpc = n_pc = 1 that is obs 11 / act 10
OBS, ACT, TA, TO = 11, 10, 4, 3


@pytest.fixture(scope="module")
def npz_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    traj_lengths = np.asarray([9, 6, 12])
    T = int(traj_lengths.sum())
    data = dict(
        states=rng.standard_normal((T, OBS)).astype(np.float32),
        actions=rng.uniform(-1, 1, (T, ACT)).astype(np.float32),
        traj_lengths=traj_lengths,
    )
    dpath = root / "train.npz"
    np.savez(dpath, **data)
    npath = root / "norms.npz"
    np.savez(
        npath,
        obs_mean=np.zeros(OBS, np.float32),
        obs_std=np.ones(OBS, np.float32),
        act_min=np.full(ACT, -1.0, np.float32),
        act_max=np.full(ACT, 1.0, np.float32),
        pnt_mean=np.zeros((1, 3), np.float32),
        pnt_std=np.ones((1, 3), np.float32),
    )
    return str(dpath), str(npath)


def test_index_table_and_windows_match_reference(npz_pair):
    dpath, npath = npz_pair
    ours = StitchedSequenceDataset(
        dpath, horizon_steps=TA, cond_steps=TO
    )
    theirs = TorchDataset(
        dpath,
        npath,
        horizon_steps=TA,
        cond_steps=TO,
        n_dpc=1,
        n_pc=1,
        device="cpu",
    )
    assert len(ours) == len(theirs)
    ref_table = np.asarray(theirs.indices)
    np.testing.assert_array_equal(np.asarray(ours.starts), ref_table[:, 0])
    np.testing.assert_array_equal(
        np.asarray(ours.num_before), ref_table[:, 0] - (
            ref_table[:, 0] - ref_table[:, 1]
        )
    )

    # every sample, including the edge-padded episode starts
    idx = jnp.arange(len(ours), dtype=jnp.int32)
    batch = ours.get_batch(idx)
    for i in range(len(ours)):
        ref = theirs[i]
        np.testing.assert_allclose(
            np.asarray(batch.actions[i]),
            ref.actions.numpy(),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"actions window, sample {i}",
        )
        np.testing.assert_allclose(
            np.asarray(batch.conditions["state"][i]),
            ref.conditions["state"].numpy(),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"obs history (edge padding), sample {i}",
        )
