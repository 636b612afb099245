"""TPU-resident batched environments.

The reference's only accelerator-resident env path is the GPU-batched
IsaacGym branch for Furniture-Bench (`env/gym_utils/__init__.py:73-108`,
`env/gym_utils/wrapper/furniture.py:47`): thousands of envs stepped as one
batched tensor program on the same device as the learner. This package is
the TPU-native generalization of that idea: environments whose dynamics are
pure JAX functions, vectorized with `vmap`, with the MultiStep action-chunk
semantics (`env/gym_utils/wrapper/multi_step.py:82`) implemented as a pure
function so the entire rollout — sampler, env, buffers — fuses into a
single XLA program on the TPU (see `agents/finetune_ppo_diffusion_device`).

Task backends:
- `pendulum` — an exact JAX port of gymnasium Pendulum-v1 dynamics
  (parity-tested step-for-step against the real env);
- `avoid`/`avoiding` — D3IL-style obstacle avoidance on the reference's
  pinned interface and geometry (see `avoid.py` for what is parity and
  what is a documented analog);
- `linear` — the deterministic analog of the dummy test env, used for
  golden tests of the on-device MultiStep semantics vs the host wrapper;
- `mjx` — MuJoCo-MJX locomotion tasks (gated on mujoco-mjx being
  installed; same task tables as the host `batched_mujoco` backend).

Host agents that don't use the fused path can still drive these through
`DeviceVectorEnv` (`adapter.py`), which exposes the standard venv API
(`seed/reset_arg/reset_one_arg/step/step_async/step_wait/close`).
"""

from dppo_tpu.envs.device.adapter import DeviceVectorEnv
from dppo_tpu.envs.device.avoid import AvoidTask, collect_avoid_demos
from dppo_tpu.envs.device.core import DevicePool, PoolState, StepOut
from dppo_tpu.envs.device.linear import LinearTask
from dppo_tpu.envs.device.pendulum import (
    PendulumPixelsTask,
    PendulumPointsTask,
    PendulumTask,
)

TASKS = {
    "pendulum": PendulumTask,
    "pendulum_pixels": PendulumPixelsTask,
    "pendulum_points": PendulumPointsTask,
    "linear": LinearTask,
    "avoid": AvoidTask,
    "avoiding": AvoidTask,
}


def make_device_task(name: str, **kwargs):
    """Build a DeviceTask by name. `mjx:<env_name>` routes to the MJX
    backend (gated on mujoco-mjx)."""
    if name.startswith("mjx:"):
        from dppo_tpu.envs.device.mjx import MJXLocomotionTask

        return MJXLocomotionTask(name.split(":", 1)[1], **kwargs)
    base = name.split("-")[0].lower()
    if base in TASKS:
        return TASKS[base](**kwargs)
    raise ValueError(
        f"unknown device task {name!r}; available: {sorted(TASKS)} "
        f"plus 'mjx:<env_name>'"
    )


__all__ = [
    "AvoidTask",
    "DevicePool",
    "DeviceVectorEnv",
    "LinearTask",
    "PendulumPixelsTask",
    "PendulumTask",
    "PoolState",
    "StepOut",
    "TASKS",
    "collect_avoid_demos",
    "make_device_task",
]
