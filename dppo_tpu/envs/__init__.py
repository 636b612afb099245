"""Environment factory.

Parity with `env/gym_utils/__init__.py:10` `make_async`: builds, per env,
raw sim → task wrapper(s) → MultiStep, then wraps N copies in an async
(sharded multiprocess) or sync pool. Robomimic/D3IL/Furniture branches are
gated on their simulators being importable; the gym-locomotion and dummy
branches run anywhere.
"""

from __future__ import annotations

import logging
from typing import Optional

from dppo_tpu.envs.multi_step import MultiStep
from dppo_tpu.envs.vector import AsyncVectorEnv, SyncVectorEnv
from dppo_tpu.envs.wrappers import get_wrapper
from dppo_tpu.envs.wrappers.mujoco_locomotion import (
    resolve_env_id,
    resolve_env_spec,
)

log = logging.getLogger(__name__)


class EnvFactory:
    """Picklable per-env constructor (async workers rebuild envs remotely)."""

    def __init__(
        self,
        env_name: str,
        env_type: Optional[str],
        wrappers: Optional[dict],
        max_episode_steps: Optional[int],
        obs_dim: int,
        action_dim: int,
        robomimic_env_cfg_path: Optional[str] = None,
        shape_meta: Optional[dict] = None,
        use_image_obs: bool = False,
        render_offscreen: bool = False,
        fake_sim: bool = False,
        **kwargs,
    ):
        from dppo_tpu.config import to_container

        self.env_name = env_name
        self.env_type = env_type
        wrappers = dict(to_container(wrappers or {}))
        self.multi_step_cfg = dict(wrappers.pop("multi_step", {}))
        self.multi_step_cfg.setdefault("max_episode_steps", max_episode_steps)
        self.wrappers = wrappers
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.robomimic_env_cfg_path = robomimic_env_cfg_path
        self.shape_meta = to_container(shape_meta)
        self.use_image_obs = use_image_obs
        self.render_offscreen = render_offscreen
        # env.fake_sim=true: substitute the deterministic fake-sim doubles
        # (envs/fake_sim.py) for the gated robomimic/D3IL simulators so the
        # full wrapper chain executes without them (reference dummy_env_fn
        # pattern, env/gym_utils/__init__.py:23-40)
        self.fake_sim = bool(fake_sim)

    def __call__(self):
        wrappers = self.wrappers
        if self.env_type == "dummy" or "dummy_lowdim" in wrappers or (
            "dummy_img" in wrappers
        ):
            key = "dummy_img" if "dummy_img" in wrappers else "dummy_lowdim"
            cfg = dict(wrappers.get(key, {}))
            cfg.setdefault("obs_dim", self.obs_dim)
            cfg.setdefault("action_dim", self.action_dim)
            env = get_wrapper(key)(None, **cfg)
        elif self.env_type == "robomimic" or "robomimic_lowdim" in wrappers or (
            "robomimic_image" in wrappers
        ):
            key = (
                "robomimic_image" if "robomimic_image" in wrappers
                else "robomimic_lowdim"
            )
            if self.fake_sim:
                from dppo_tpu.envs.fake_sim import FakeRobosuiteEnv

                fkw = {"action_dim": self.action_dim}
                # match the config's frame size (reference pixel configs run
                # 96x96; the double defaults to 48x48)
                rgb_shape = (self.shape_meta or {}).get("obs", {}).get("rgb", {}).get("shape")
                if rgb_shape is not None:
                    fkw["img_hw"] = (int(rgb_shape[1]), int(rgb_shape[2]))
                raw = FakeRobosuiteEnv(**fkw)
            else:
                import json

                import robomimic.utils.env_utils as EnvUtils  # gated

                with open(self.robomimic_env_cfg_path) as f:
                    env_meta = json.load(f)
                raw = EnvUtils.create_env_from_metadata(
                    env_meta=env_meta,
                    render=False,
                    render_offscreen=self.render_offscreen,
                    use_image_obs=self.use_image_obs,
                )
                raw.env.hard_reset = False
            # the img wrapper cfg may carry its own shape_meta interpolation
            # (reference schema, ft_ppo_diffusion_mlp_img.yaml:46) — let it
            # win over the top-level one rather than passing a duplicate
            wkw = dict(wrappers[key])
            wkw.setdefault("shape_meta", self.shape_meta)
            env = get_wrapper(key)(raw, **wkw)
        elif "d3il_lowdim" in wrappers and self.fake_sim:
            from dppo_tpu.envs.fake_sim import FakeD3ilEnv

            raw = FakeD3ilEnv(obs_dim=self.obs_dim, action_dim=self.action_dim)
            env = get_wrapper("d3il_lowdim")(raw, **wrappers["d3il_lowdim"])
        else:
            import gymnasium

            # MultiStep owns the episode budget; effectively disable the
            # inner TimeLimit (reference bypasses gym's TimeLimit the same
            # way via MultiStep bookkeeping, multi_step.py:156-166)
            env_id, make_kwargs = resolve_env_spec(self.env_name)
            raw = gymnasium.make(
                env_id, max_episode_steps=int(1e9), **make_kwargs
            )
            key = "mujoco_locomotion_lowdim"
            if key in wrappers:
                env = get_wrapper(key)(raw, **wrappers[key])
            elif "d3il_lowdim" in wrappers:
                env = get_wrapper("d3il_lowdim")(raw, **wrappers["d3il_lowdim"])
            else:
                raise ValueError(
                    f"no task wrapper configured for env {self.env_name!r}"
                )
        return MultiStep(env, **self.multi_step_cfg)


def make_async(
    env_name: str,
    env_type: Optional[str] = None,
    num_envs: int = 1,
    asynchronous: bool = True,
    max_episode_steps: Optional[int] = None,
    wrappers: Optional[dict] = None,
    n_workers: Optional[int] = None,
    obs_dim: int = 11,
    action_dim: int = 3,
    use_shm: bool = False,
    backend: str = "process",
    **kwargs,
):
    if backend == "batched_mujoco":
        # single-process batched pool on the native threaded mujoco.rollout
        # module — fuses sim + task wrapper + MultiStep + vector pool
        from dppo_tpu.config import to_container
        from dppo_tpu.envs.batched_mujoco import BatchedMujocoLocomotionEnv

        w = dict(to_container(wrappers or {}))
        ms = dict(w.get("multi_step", {}))
        task = dict(w.get("mujoco_locomotion_lowdim", {}))
        # defaults must match MultiStep's, so switching backends never
        # changes semantics; reject multi_step options the batched pool
        # does not implement rather than silently ignoring them
        if ms.get("reward_agg_method", "sum") != "sum":
            raise NotImplementedError(
                "batched_mujoco backend only supports reward_agg_method=sum"
            )
        if ms.get("pass_full_observations", False):
            raise NotImplementedError(
                "batched_mujoco backend does not support "
                "pass_full_observations"
            )
        return BatchedMujocoLocomotionEnv(
            env_name,
            n_envs=num_envs,
            normalization_path=task["normalization_path"],
            n_obs_steps=int(ms.get("n_obs_steps", 1)),
            n_action_steps=int(ms.get("n_action_steps", 1)),
            max_episode_steps=ms.get("max_episode_steps", max_episode_steps),
            reset_within_step=bool(ms.get("reset_within_step", False)),
            nthread=n_workers,
            record_states=bool(kwargs.get("record_states", False)),
        )
    if backend == "device":
        # TPU-resident batched envs: pure-JAX dynamics vmapped on the
        # learner device, MultiStep semantics as a jittable pure function
        # (the TPU-native generalization of the reference's GPU-batched
        # IsaacGym branch). See dppo_tpu/envs/device/.
        from dppo_tpu.config import to_container
        from dppo_tpu.envs.device import DeviceVectorEnv, make_device_task

        w = dict(to_container(wrappers or {}))
        ms = dict(w.get("multi_step", {}))
        if ms.get("reward_agg_method", "sum") != "sum":
            raise NotImplementedError(
                "device backend only supports reward_agg_method=sum"
            )
        if ms.get("pass_full_observations", False):
            raise NotImplementedError(
                "device backend does not support pass_full_observations"
            )
        task_kwargs = dict(
            to_container(kwargs.pop("device_task_kwargs", {}) or {})
        )
        task_kwargs.setdefault(
            "normalization_path",
            dict(w.get("mujoco_locomotion_lowdim", {})).get(
                "normalization_path"
            )
            or dict(w.get("d3il_lowdim", {})).get("normalization_path"),
        )
        task_kwargs.setdefault("obs_dim", obs_dim)
        task_kwargs.setdefault("action_dim", action_dim)
        task_name = kwargs.pop("device_task", None) or env_name
        task = make_device_task(task_name, **task_kwargs)
        return DeviceVectorEnv(
            task,
            n_envs=num_envs,
            n_obs_steps=int(ms.get("n_obs_steps", 1)),
            n_action_steps=int(ms.get("n_action_steps", 1)),
            max_episode_steps=ms.get("max_episode_steps", max_episode_steps),
            reset_within_step=bool(ms.get("reset_within_step", False)),
        )
    if env_type == "furniture":
        # GPU-batched IsaacGym branch (parity: env/gym_utils/__init__.py:73-108)
        if kwargs.get("fake_sim"):
            from dppo_tpu.envs.fake_sim import FakeFurnitureEnv
            from dppo_tpu.envs.wrappers.furniture import (
                FurnitureRLSimEnvMultiStepWrapper,
            )

            env = FakeFurnitureEnv(
                num_envs=num_envs, action_dim=action_dim
            )
            return FurnitureRLSimEnvMultiStepWrapper(
                env,
                n_obs_steps=kwargs.get("obs_steps", 1),
                n_action_steps=kwargs.get("act_steps", 1),
                max_episode_steps=max_episode_steps,
                prev_action=False,
                reset_within_step=False,
                pass_full_observations=False,
                normalization_path=kwargs.get("normalization_path"),
                sparse_reward=kwargs.get("sparse_reward", False),
            )
        try:
            from furniture_bench.envs.furniture_rl_sim_env import (
                FurnitureRLSimEnv,
            )
            from furniture_bench.envs.observation import DEFAULT_STATE_OBS
        except ImportError as e:
            raise NotImplementedError(
                "Furniture-Bench requires IsaacGym (CUDA), which is not "
                "installed on this TPU host; run the env server on a GPU "
                "host behind this same wrapper API (SURVEY §2.9)."
            ) from e
        from dppo_tpu.envs.wrappers.furniture import (
            FurnitureRLSimEnvMultiStepWrapper,
        )

        env = FurnitureRLSimEnv(
            act_rot_repr="rot_6d",
            action_type="pos",
            april_tags=False,
            concat_robot_state=True,
            ctrl_mode="diffik",
            obs_keys=DEFAULT_STATE_OBS,
            furniture=kwargs.get("furniture"),
            gpu_id=kwargs.get("gpu_id", 0),
            headless=kwargs.get("headless", True),
            num_envs=num_envs,
            observation_space="state",
            randomness=kwargs.get("randomness", "low"),
            max_env_steps=max_episode_steps,
            record=kwargs.get("record", False),
            pos_scalar=1,
            rot_scalar=1,
            stiffness=1_000,
            damping=200,
        )
        return FurnitureRLSimEnvMultiStepWrapper(
            env,
            n_obs_steps=kwargs.get("obs_steps", 1),
            n_action_steps=kwargs.get("act_steps", 1),
            max_episode_steps=max_episode_steps,
            prev_action=False,
            reset_within_step=False,
            pass_full_observations=False,
            normalization_path=kwargs.get("normalization_path"),
            sparse_reward=kwargs.get("sparse_reward", False),
        )
    fn = EnvFactory(
        env_name,
        env_type,
        wrappers,
        max_episode_steps,
        obs_dim,
        action_dim,
        **kwargs,
    )
    env_fns = [fn] * num_envs
    if asynchronous:
        shm_state_shape = None
        if use_shm:
            n_obs_steps = int(
                (wrappers or {}).get("multi_step", {}).get("n_obs_steps", 1)
            )
            shm_state_shape = (n_obs_steps, obs_dim)
        return AsyncVectorEnv(
            env_fns,
            n_workers=n_workers,
            use_shm=use_shm,
            shm_state_shape=shm_state_shape,
        )
    return SyncVectorEnv(env_fns)
