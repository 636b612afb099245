"""Task wrapper registry (parity: `env/gym_utils/wrapper/__init__.py:8-14`)."""

from dppo_tpu.envs.wrappers.mujoco_locomotion import MujocoLocomotionLowdimWrapper
from dppo_tpu.envs.wrappers.dummy import DummyImgWrapper, DummyLowdimWrapper

WRAPPERS = {
    "mujoco_locomotion_lowdim": MujocoLocomotionLowdimWrapper,
    "dummy_lowdim": DummyLowdimWrapper,
    "dummy_img": DummyImgWrapper,
}


def get_wrapper(name):
    if name in WRAPPERS:
        return WRAPPERS[name]
    if name == "robomimic_lowdim":
        from dppo_tpu.envs.wrappers.robomimic_lowdim import RobomimicLowdimWrapper

        return RobomimicLowdimWrapper
    if name == "robomimic_image":
        from dppo_tpu.envs.wrappers.robomimic_image import RobomimicImageWrapper

        return RobomimicImageWrapper
    if name == "d3il_lowdim":
        from dppo_tpu.envs.wrappers.d3il_lowdim import D3ilLowdimWrapper

        return D3ilLowdimWrapper
    raise KeyError(f"unknown wrapper: {name}")
