"""Emit the robomimic `env_meta` JSONs the experiment configs point to.

The reference ships these under `cfg/robomimic/env_meta/*.json` — small
machine-generated robosuite boot dicts originally extracted from the
robomimic dataset HDF5s (`robomimic.utils.file_utils.get_env_metadata_from_
dataset`). They are pure simulator facts: the robosuite task class, robot
list, the standard OSC_POSE delta-pose controller, and camera settings for
the pixel variants. This tool reconstructs them from that spec so the
shipped configs (`robomimic_env_cfg_path: cfg/robomimic/env_meta/<task>[
-img].json`, e.g. cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp.yaml)
run without the original HDF5s on disk.

Run:  python tools/gen_robomimic_env_meta.py
"""

from __future__ import annotations

import json
import os

# robosuite's standard OSC_POSE controller at robomimic defaults:
# 20 Hz delta pose commands, +-5 cm / +-0.5 rad per step, fixed impedance.
OSC_POSE = {
    "type": "OSC_POSE",
    "input_max": 1,
    "input_min": -1,
    "output_max": [0.05, 0.05, 0.05, 0.5, 0.5, 0.5],
    "output_min": [-0.05, -0.05, -0.05, -0.5, -0.5, -0.5],
    "kp": 150,
    "damping": 1,
    "impedance_mode": "fixed",
    "kp_limits": [0, 300],
    "damping_limits": [0, 10],
    "position_limits": None,
    "orientation_limits": None,
    "uncouple_pos_ori": True,
    "control_delta": True,
    "interpolation": None,
    "ramp_ratio": 0.2,
}

# task -> (robosuite env class, robots, img-variant cameras, extra kwargs)
TASKS = {
    "lift": ("Lift", ["Panda"], ["robot0_eye_in_hand"], {}),
    "can": ("PickPlaceCan", ["Panda"], ["robot0_eye_in_hand"], {}),
    "square": ("NutAssemblySquare", ["Panda"], ["agentview"], {}),
    "transport": (
        "TwoArmTransport",
        ["Panda", "Panda"],
        ["shouldercamera0", "shouldercamera1"],
        {"env_configuration": "single-arm-opposed"},
    ),
}


def build(task: str, img: bool) -> dict:
    env_name, robots, cameras, extra = TASKS[task]
    kwargs = {
        "has_renderer": False,
        "has_offscreen_renderer": img,
        "ignore_done": True,
        "use_object_obs": True,
        "use_camera_obs": img,
        "control_freq": 20,
        "controller_configs": dict(OSC_POSE),
        "robots": list(robots),
        "camera_depths": False,
        "camera_heights": 96 if img else 84,
        "camera_widths": 96 if img else 84,
        "reward_shaping": False,
        **extra,
    }
    if img:
        kwargs["camera_names"] = list(cameras)
        kwargs["render_gpu_device_id"] = 0
    # type 1 == robomimic EnvType.ROBOSUITE_TYPE
    return {"env_name": env_name, "env_version": "1.4.1", "type": 1,
            "env_kwargs": kwargs}


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "cfg", "robomimic",
        "env_meta",
    )
    os.makedirs(out_dir, exist_ok=True)
    for task in TASKS:
        for img in (False, True):
            name = f"{task}-img.json" if img else f"{task}.json"
            path = os.path.join(out_dir, name)
            with open(path, "w") as f:
                json.dump(build(task, img), f)
            print("wrote", os.path.relpath(path))


if __name__ == "__main__":
    main()
