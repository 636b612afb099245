"""Pendulum-v1 as a device task: an exact JAX port of gymnasium's
`PendulumEnv` dynamics (gymnasium/envs/classic_control/pendulum.py), used to
exercise the fully-on-device rollout path with a real benchmark task.
Parity-tested step-for-step against the real env in
`tests/test_device_env.py`.

Task-wrapper semantics follow `wrapper/mujoco_locomotion_lowdim.py:12`
(our `envs/wrappers/mujoco_locomotion.py`): observations are min/max
normalized to [-1,1] against demo statistics, actions arrive in [-1,1] and
are unnormalized to the torque range. With `normalization_path=None` the
canonical space bounds (|cosθ|,|sinθ| ≤ 1, |θ̇| ≤ 8, |u| ≤ 2) are used.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dppo_tpu.envs.wrappers.mujoco_locomotion import (
    normalize_obs,
    unnormalize_action,
)


class PendulumState(NamedTuple):
    th: jnp.ndarray  # () angle
    thdot: jnp.ndarray  # () angular velocity


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class PendulumTask:
    obs_dim = 3
    action_dim = 1

    def __init__(
        self,
        normalization_path: Optional[str] = None,
        g: float = 10.0,
        **kwargs,
    ):
        self.max_speed = 8.0
        self.max_torque = 2.0
        self.dt = 0.05
        self.g = float(g)
        self.m = 1.0
        self.l = 1.0
        if normalization_path is not None:
            norm = np.load(normalization_path)
            self.obs_min = jnp.asarray(norm["obs_min"], dtype=jnp.float32)
            self.obs_max = jnp.asarray(norm["obs_max"], dtype=jnp.float32)
            self.action_min = jnp.asarray(norm["action_min"], jnp.float32)
            self.action_max = jnp.asarray(norm["action_max"], jnp.float32)
        else:
            self.obs_min = jnp.asarray([-1.0, -1.0, -self.max_speed])
            self.obs_max = jnp.asarray([1.0, 1.0, self.max_speed])
            self.action_min = jnp.asarray([-self.max_torque])
            self.action_max = jnp.asarray([self.max_torque])

    def _obs(self, state: PendulumState) -> jnp.ndarray:
        raw = jnp.stack(
            [jnp.cos(state.th), jnp.sin(state.th), state.thdot]
        )
        return normalize_obs(raw, self.obs_min, self.obs_max).astype(
            jnp.float32
        )

    def reset(self, rng):
        # gymnasium reset: state ~ U(-[π, 1], [π, 1])
        high = jnp.asarray([jnp.pi, 1.0])
        s = jax.random.uniform(rng, (2,), minval=-high, maxval=high)
        state = PendulumState(th=s[0], thdot=s[1])
        return state, self._obs(state)

    def step(self, state: PendulumState, action, rng):
        del rng  # dynamics are deterministic
        u = unnormalize_action(action, self.action_min, self.action_max)[0]
        u = jnp.clip(u, -self.max_torque, self.max_torque)
        th, thdot = state.th, state.thdot
        costs = (
            angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * (u**2)
        )
        newthdot = thdot + (
            3 * self.g / (2 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        new_state = PendulumState(th=newth, thdot=newthdot)
        return (
            new_state,
            self._obs(new_state),
            (-costs).astype(jnp.float32),
            jnp.asarray(False),
        )


# ---------------------------------------------------------------- pixels
def render_pendulum_rgb(cos_sin, img_h: int = 48, img_w: int = 48):
    """Rasterize the pendulum on-device: an anti-aliased rod from the pivot
    (image center) toward (sinθ, cosθ) — gymnasium's rendering convention,
    θ=0 pointing up — plus a tip marker and a pivot dot, one per channel.

    Pure jnp over arbitrary leading dims: cos_sin (..., 2) raw cosθ/sinθ
    -> (..., 3, img_h, img_w) float32 in [0, 1]. This is the TPU-native
    analog of the reference's host-side offscreen renderers (robomimic /
    gym `render(mode="rgb_array")` feeding the img agents): the frame is a
    deterministic pure function of the physical state, so pixels can be
    (re)produced anywhere inside a jitted program instead of being stepped
    across the host boundary.
    """
    c, s = cos_sin[..., 0], cos_sin[..., 1]
    norm = jnp.sqrt(c * c + s * s) + 1e-8
    c, s = c / norm, s / norm
    tip_x, tip_y = 0.85 * s, 0.85 * c  # screen x right, y up
    ys = jnp.linspace(1.0, -1.0, img_h)  # row 0 = top of frame
    xs = jnp.linspace(-1.0, 1.0, img_w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    tx = tip_x[..., None, None]
    ty = tip_y[..., None, None]
    # distance from each pixel to the segment [pivot, tip]
    len2 = tx * tx + ty * ty
    t = jnp.clip((gx * tx + gy * ty) / (len2 + 1e-8), 0.0, 1.0)
    dx = gx - t * tx
    dy = gy - t * ty
    d = jnp.sqrt(dx * dx + dy * dy)
    thick = 3.0 / img_h
    rod = jnp.clip(1.0 - d / (2.0 * thick), 0.0, 1.0)
    dt_ = jnp.sqrt((gx - tx) ** 2 + (gy - ty) ** 2)
    tip = jnp.clip(1.0 - dt_ / (3.0 * thick), 0.0, 1.0)
    dp = jnp.sqrt(gx * gx + gy * gy)
    piv = jnp.broadcast_to(
        jnp.clip(1.0 - dp / (2.0 * thick), 0.0, 1.0), rod.shape
    )
    return jnp.stack([rod, tip, piv], axis=-3).astype(jnp.float32)


class PendulumPixelsTask(PendulumTask):
    """Pendulum with PIXEL observations, rendered on-device.

    The pool's latent obs stays the 3-dim normalized [cosθ, sinθ, θ̇]
    vector; `split_obs` (consumed by `DeviceVectorEnv` and the fused
    vision agents) renders the rgb frames from (cosθ, sinθ) and exposes
    ONLY the angular velocity as the proprio "state" — the policy cannot
    locate the rod without reading the pixels, so learning success is
    evidence the vision stack (ViT encoder + VisionDiffusionMLP +
    RandomShiftsAug) actually learns from images. Frames are rendered
    once per macro-step inside the fused program (the rollout scan stores
    them in the iteration's obs buffer, which the update then consumes) —
    the win over the reference is that no frame ever crosses the host
    boundary, not recompute-over-storage; the reference's img agents
    require host simulators streaming pixels host->device every macro-step
    (`train_ppo_diffusion_img_agent.py:20`).
    """

    proprio_dim = 1  # normalized thdot

    def __init__(self, img_h: int = 48, img_w: int = 48, **kwargs):
        kwargs.pop("obs_dim", None)
        kwargs.pop("action_dim", None)
        super().__init__(**kwargs)
        self.img_h, self.img_w = int(img_h), int(img_w)

    def split_obs(self, hist: jnp.ndarray) -> dict:
        """hist (..., To, 3) normalized -> {"rgb": (..., To, 3, H, W),
        "state": (..., To, 1)}."""
        lo, hi = self.obs_min[:2], self.obs_max[:2]
        cs = lo + (hist[..., :2] + 1.0) * 0.5 * (hi - lo)
        rgb = render_pendulum_rgb(cs, self.img_h, self.img_w)
        return {"rgb": rgb, "state": hist[..., 2:]}


# ------------------------------------------------------------- point cloud
def sample_pendulum_points(
    cos_sin, n_rod: int = 24, n_pad: int = 8
):
    """Point-cloud "scan" of the pendulum rod, on-device: `n_rod` points at
    fixed fractions along the segment pivot->tip in 3D (x = t·sinθ,
    y = t·cosθ, z = 0.1·t — a slight out-of-plane lift so the cloud is not
    degenerate for 3D encoders), back-padded with `n_pad` all-zero rows
    (the PointEncoder convention for variable-size clouds,
    `nets/point_encoder.py valid_mask`). Pure jnp over arbitrary leading
    dims: cos_sin (..., 2) -> (..., n_rod + n_pad, 3) float32. The
    TPU-native analog of a depth-camera point cloud feeding the fork's
    point pathway (`train_ppo_diffusion_vis_agent.py:26-27`)."""
    c, s = cos_sin[..., 0], cos_sin[..., 1]
    norm = jnp.sqrt(c * c + s * s) + 1e-8
    c, s = c / norm, s / norm
    t = jnp.linspace(1.0 / n_rod, 1.0, n_rod)  # never exactly the pivot
    x = t * s[..., None]
    y = t * c[..., None]
    z = 0.1 * t * jnp.ones_like(x)
    rod = jnp.stack([x, y, z], axis=-1)  # (..., n_rod, 3)
    pad = jnp.zeros(rod.shape[:-2] + (n_pad, 3), rod.dtype)
    return jnp.concatenate([rod, pad], axis=-2).astype(jnp.float32)


class PendulumPointsTask(PendulumTask):
    """Pendulum with POINT-CLOUD observations, sampled on-device.

    The fork-parity vehicle for the point pathway
    (`TrainPPOVisDiffusionAgent(vis_key="point")` + PointUnet1D +
    PointCritic, reference `train_ppo_diffusion_vis_agent.py:26-27`,
    `unet.py:621`, `critic.py:209`): `split_obs` emits
    {"point": (..., To, 1, L, 3), "state": (..., To, 1)} — one frame of L
    rod points (zero back-padding included, exercising the encoders' masked
    pooling) and the normalized angular velocity as proprio. As with the
    pixels task, the rod's angle is only observable through the cloud.
    """

    proprio_dim = 1  # normalized thdot

    def __init__(self, n_rod: int = 24, n_pad: int = 8, **kwargs):
        kwargs.pop("obs_dim", None)
        kwargs.pop("action_dim", None)
        super().__init__(**kwargs)
        self.n_rod, self.n_pad = int(n_rod), int(n_pad)

    @property
    def n_points(self) -> int:
        return self.n_rod + self.n_pad

    def split_obs(self, hist: jnp.ndarray) -> dict:
        """hist (..., To, 3) normalized -> {"point": (..., To, 1, L, 3),
        "state": (..., To, 1)}."""
        lo, hi = self.obs_min[:2], self.obs_max[:2]
        cs = lo + (hist[..., :2] + 1.0) * 0.5 * (hi - lo)
        pts = sample_pendulum_points(cs, self.n_rod, self.n_pad)
        return {"point": pts[..., None, :, :], "state": hist[..., 2:]}
