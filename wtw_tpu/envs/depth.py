"""Pseudo-depth camera: ray-marched heightfield depth images.

TPU-native substitute for Isaac Gym's GPU depth-camera renderer
(tasks/go2_parkour.py attach_camera/update_depth_buffer :761-808 — a
closed-source rasterizer with no TPU equivalent). Since the only scene
geometry is the terrain heightfield (+ ceilings), a depth image can be
synthesized exactly by ray-marching each pixel's ray against the
heightfield. Output matches the reference's processed depth: clipped to
[clip_min, clip_max], normalized to [0, 1] (:800-802), cropped square.

The march is a fixed-length fori over the ray (XLA-friendly); one
`height_at` gather per (pixel, step).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.heightfield import HeightField, height_at
from ..utils import quat as quat_util


@dataclass(frozen=True)
class DepthCameraCfg:
    # cfg/task/Go2Parkour.yaml env.depth (:215-223)
    height: int = 48
    width: int = 48          # reference crops 85 -> 48 (:523, [..., 19:-18])
    position: tuple = (0.3, 0.0, 0.1)   # camera offset in base frame
    pitch_deg: float = 0.0   # randomized ±5° in the reference (:778)
    horizontal_fov_deg: float = 87.0
    clip_min: float = 0.04
    clip_max: float = 1.0
    march_steps: int = 48    # samples along each ray
    update_interval: int = 5


def _pixel_dirs(cfg: DepthCameraCfg) -> np.ndarray:
    """Unit ray directions in the camera frame (x forward, y left, z up).

    Angular extent matches the reference's PROCESSED image: the 87° hfov
    spans the native 85-px width, and the shipped 48x48 crop keeps the
    central 48/85 of it (go2_parkour.py:523 `[..., 19:-18]`) — i.e. a
    ~56°x56° square. Building a square 48x48 at the full 87° (pre-round-5)
    gave ~1.5x coarser angular resolution than the reference student saw."""
    hfov = np.radians(cfg.horizontal_fov_deg)
    native_w = 85 if cfg.width <= 64 else cfg.width
    tan_h = np.tan(hfov / 2) * cfg.width / native_w
    tan_v = tan_h * cfg.height / cfg.width
    v = np.linspace(tan_v, -tan_v, cfg.height)     # top -> bottom
    u = np.linspace(tan_h, -tan_h, cfg.width)      # left -> right
    vv, uu = np.meshgrid(v, u, indexing="ij")
    dirs = np.stack([np.ones_like(uu), uu, vv], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pitch = np.radians(cfg.pitch_deg)
    # pitch the camera down by rotating about +y
    c, s = np.cos(pitch), np.sin(pitch)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (dirs @ R.T).astype(np.float32)         # (H, W, 3)


def make_depth_fn(hf: HeightField, cfg: DepthCameraCfg = DepthCameraCfg(),
                  model=None):
    """Returns render(base_pos (N,3), base_quat (N,4)) -> (N, H, W) float32
    in [0, 1] (0 = near clip, 1 = far clip), like the reference's
    normalized depth (:800-802).

    With `model` (a RobotModel), the robot's own collision spheres are
    composited into the frame by closed-form ray-sphere intersection, so
    the swinging legs appear at near depth like they do in Isaac's
    rasterized camera (tasks/go2_parkour.py:784-808 renders the full robot
    mesh; our collision geometry IS spheres, so sphere splats are the
    exact self-view of the simulated body). render then takes a third
    argument joint_q (N, nj)."""
    dirs_cam = jnp.asarray(_pixel_dirs(cfg).reshape(-1, 3))    # (P, 3)
    cam_off = jnp.asarray(cfg.position, jnp.float32)
    ts = jnp.linspace(cfg.clip_min, cfg.clip_max, cfg.march_steps)

    def terrain_depth(base_pos, base_quat):
        # yaw-only rotation like the height scan (a full rotation would need
        # roll/pitch-corrected rays; the reference camera is body-fixed, so
        # apply the full base rotation):
        origin = base_pos + quat_util.quat_rotate(base_quat, cam_off)
        d_world = jax.vmap(lambda d: quat_util.quat_rotate(base_quat, d))(
            dirs_cam)                                           # (P, 3)
        # sample points: (P, S, 3)
        pts = origin[None, None, :] + d_world[:, None, :] * ts[None, :, None]
        ground = height_at(hf, pts[..., :2])                    # (P, S)
        below = pts[..., 2] <= ground
        # first marched sample below the terrain; clip_max when none
        hit_idx = jnp.argmax(below, axis=-1)                    # (P,)
        any_hit = jnp.any(below, axis=-1)
        depth = jnp.where(any_hit, ts[hit_idx], cfg.clip_max)
        return depth, origin, d_world

    def norm_img(depth):
        norm = (depth - cfg.clip_min) / (cfg.clip_max - cfg.clip_min)
        return norm.reshape(cfg.height, cfg.width)

    def render_one(base_pos, base_quat):
        depth, _, _ = terrain_depth(base_pos, base_quat)
        return norm_img(depth)

    if model is None:
        return jax.vmap(render_one)

    from ..physics.engine import fk

    def render_one_legs(base_pos, base_quat, joint_q):
        depth, origin, d_world = terrain_depth(base_pos, base_quat)
        body_pos, body_quat, _, _ = fk(model, base_pos, base_quat, joint_q)
        R = quat_util.quat_to_matrix(body_quat)                 # (nb,3,3)
        centers = body_pos[model.sph_body] + jnp.einsum(
            "kij,kj->ki", R[model.sph_body], model.sph_pos)     # (K, 3)
        oc = centers - origin                                   # (K, 3)
        b = d_world @ oc.T                                      # (P, K)
        disc = b * b - (jnp.sum(oc * oc, axis=-1)[None, :]
                        - (model.sph_radius ** 2)[None, :])     # (P, K)
        t = b - jnp.sqrt(jnp.maximum(disc, 0.0))                # near root
        hit = (disc > 0.0) & (t > cfg.clip_min)
        t_sph = jnp.min(jnp.where(hit, t, cfg.clip_max), axis=-1)  # (P,)
        return norm_img(jnp.minimum(depth, t_sph))

    return jax.vmap(render_one_legs)
