"""dppo_tpu — a TPU-native framework for diffusion-policy pretraining and RL fine-tuning.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch framework `enyen/dppo` (DPPO: Diffusion Policy Policy Optimization):

* behavior-cloning pretraining of diffusion / Gaussian / GMM action-chunk
  policies from demonstration data,
* online RL fine-tuning (flagship: PPO on the two-layer denoising MDP),
* a zoo of diffusion-RL and classic RL baselines,
* vectorized host-side simulation behind a lockstep batched interface,
* data-parallel scaling over a `jax.sharding.Mesh` (ICI/DCN collectives).

Design stance (TPU-first, not a port):
  - the full denoising chain is a jitted `lax.scan` over K steps,
  - all RL math (GAE, reward scaling, advantage norm, PPO epochs) runs
    on-device under jit with static shapes,
  - the base/fine-tuned actor split is two parameter trees with per-step
    selection inside the scan (the reference dispatches per-sample and wastes
    a base-actor forward per update batch; we never do),
  - explicit threaded `jax.random` keys replace torch global RNG,
  - orbax checkpoints carry the complete train state.
"""

__version__ = "0.1.0"
