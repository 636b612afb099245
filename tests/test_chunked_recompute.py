"""Chunked value/old-logprob recompute (reference parity:
`train_ppo_agent.py:22-25` `logprob_batch_size`): numerical equality with
the full-batch recompute, and bounded peak activation memory at pixel
operating points."""

import numpy as np
import jax
import jax.numpy as jnp

from dppo_tpu.config import get_class
from dppo_tpu.utils.chunk import chunked_apply
from tests.test_finetune_dppo import _cfg
from tests.test_img_agent import img_cfg


def test_chunked_apply_matches_full():
    """Non-dividing chunk sizes, dict args, pytree outputs."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((13, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((13, 2)), jnp.float32)

    def fn(a, b):
        return {"s": (a**2).sum(axis=1), "c": jnp.concatenate([a, b], axis=1)}

    full = fn(x, y)
    for chunk in (1, 3, 5, 13, 40, 0):
        out = chunked_apply(fn, chunk, x, y)
        np.testing.assert_allclose(
            np.asarray(out["s"]), np.asarray(full["s"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out["c"]), np.asarray(full["c"]), rtol=1e-6
        )


def test_fused_update_chunked_matches_full(tmp_path):
    """The fused DPPO update with logprob_batch_size chunking is numerically
    identical to the full-batch recompute (golden chunked-vs-full pattern)."""
    cfg = _cfg(tmp_path)
    agent = get_class(cfg._target_)(cfg)
    S, E = 6, 4
    K_ft = agent.model.ft_denoising_steps
    Ta, Da = agent.model.horizon_steps, agent.model.action_dim
    rng = np.random.default_rng(1)
    obs_trajs = {
        "state": jnp.asarray(
            rng.standard_normal((S, E, 1, cfg.obs_dim)), jnp.float32
        )
    }
    chains = jnp.asarray(
        rng.standard_normal((S, E, K_ft + 1, Ta, Da)), jnp.float32
    )
    rewards = jnp.asarray(rng.standard_normal((S, E)), jnp.float32)
    terminated = jnp.zeros((S, E), jnp.float32)
    firsts = jnp.zeros((S, E), jnp.float32)
    final_obs = {
        "state": jnp.asarray(
            rng.standard_normal((E, 1, cfg.obs_dim)), jnp.float32
        )
    }
    key = jax.random.key(7)
    itr = jnp.asarray(0, jnp.int32)

    args = (
        agent.update_state, obs_trajs, chains, rewards, terminated, firsts,
        final_obs, key, itr,
    )
    agent.logprob_batch_size = 0
    state_full, aux_full = jax.jit(agent._update)(*args)
    agent.logprob_batch_size = 10  # SE=24 -> chunks of 10, padded tail
    state_chunk, aux_chunk = jax.jit(agent._update)(*args)

    for a, b in zip(
        jax.tree_util.tree_leaves(state_full.params),
        jax.tree_util.tree_leaves(state_chunk.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(aux_full),
        jax.tree_util.tree_leaves(aux_chunk),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_pixel_update_memory_bounded(tmp_path):
    """At a (scaled) robomimic pixel operating point, the chunked program's
    temp (activation) memory is a small fraction of the full-batch
    program's — the mechanism that keeps 50 envs x 300 steps of image
    history through the ViT inside a v5e HBM budget."""
    cfg = img_cfg(tmp_path, n_envs=4, n_steps=30)
    agent = get_class(cfg._target_)(cfg)
    S, E = 30, 4  # SE=120 rows of (3,32,32) rgb history
    K_ft = agent.model.ft_denoising_steps
    Ta, Da = agent.model.horizon_steps, agent.model.action_dim
    obs_trajs = {
        "state": jnp.zeros((S, E, 1, cfg.obs_dim), jnp.float32),
        "rgb": jnp.zeros((S, E, 1, 3, 32, 32), jnp.float32),
    }
    chains = jnp.zeros((S, E, K_ft + 1, Ta, Da), jnp.float32)
    rewards = jnp.zeros((S, E), jnp.float32)
    zeros = jnp.zeros((S, E), jnp.float32)
    final_obs = {
        "state": jnp.zeros((E, 1, cfg.obs_dim), jnp.float32),
        "rgb": jnp.zeros((E, 1, 3, 32, 32), jnp.float32),
    }
    args = (
        agent.update_state, obs_trajs, chains, rewards, zeros, zeros,
        final_obs, jax.random.key(0), jnp.asarray(0, jnp.int32),
    )

    def temp_bytes():
        compiled = jax.jit(agent._update).lower(*args).compile()
        return compiled.memory_analysis().temp_size_in_bytes

    agent.logprob_batch_size = 0
    full = temp_bytes()
    agent.logprob_batch_size = 12  # 10 chunks
    chunked = temp_bytes()
    # chunking must never cost memory
    assert chunked <= full, (full, chunked)
    # r5 cond-hoist: get_logprobs no longer repeats the rgb buffer K_ft-fold
    # (the encoder runs once per row and only the small feature is
    # repeated), so the un-chunked recompute itself became cheap — the
    # memory the chunked path used to reclaim is now reclaimed for BOTH
    # paths. Pin that: the hoisted full recompute must stay well under the
    # pre-hoist one (disable_cond_hoist=True replays the old re-encode path).
    agent.logprob_batch_size = 0
    agent.model.disable_cond_hoist = True
    full_prehoist = temp_bytes()
    agent.model.disable_cond_hoist = False
    assert full <= 0.7 * full_prehoist, (
        f"cond-hoist should cut recompute temp memory: hoisted={full} "
        f"pre-hoist={full_prehoist}"
    )
