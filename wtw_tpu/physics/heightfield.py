"""Heightfield terrain representation + queries.

Replaces both the PhysX static collider (gym.add_triangle_mesh, reference
legged_robot.py:1476) and the height raycast grid (`_get_heights`,
legged_robot.py:1772-1806). The reference only ever *queries* terrain
heights on a grid, so a heightfield (not a trimesh) is the native
representation here. One heightfield is shared by all envs on a device.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


from typing import Optional


@struct.dataclass
class HeightField:
    heights: jnp.ndarray          # (H, W) float32 meters
    horizontal_scale: jnp.ndarray  # () meters per cell
    origin: jnp.ndarray           # (2,) world xy of cell (0, 0)
    # packed per-cell corner rows [h00, h10, h01, h11] (H*W, 4). One ROW
    # gather per query point is ~4x faster on TPU than four scalar gathers
    # (gather cost is per-offset, not per-element) — this query is the hot
    # op of the engine. Built by make_heightfield; None falls back to
    # scalar gathers.
    corners: Optional[jnp.ndarray] = None
    # static: heights is a constant grid (e.g. flat ground). Lets the
    # engine replace the per-substep corner gather with a compile-time
    # constant — the gather was the hottest XLA op of the MoB training
    # step (~14% of device time at 4096 envs) and is identically zero on
    # the flagship flat-ground workload.
    is_flat: bool = struct.field(pytree_node=False, default=False)
    # static: the constant height when is_flat (usable even when `heights`
    # is a tracer, e.g. inside jit)
    flat_value: float = struct.field(pytree_node=False, default=0.0)

    @property
    def shape(self):
        return self.heights.shape


def pack_corners(heights: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H*W, 4) rows [h(i,j), h(i+1,j), h(i,j+1), h(i+1,j+1)]
    with edge clamping."""
    h = heights
    h_r = jnp.concatenate([h[1:], h[-1:]], axis=0)        # i+1
    h_c = jnp.concatenate([h[:, 1:], h[:, -1:]], axis=1)  # j+1
    h_rc = jnp.concatenate([h_r[:, 1:], h_r[:, -1:]], axis=1)
    return jnp.stack([h.reshape(-1), h_r.reshape(-1),
                      h_c.reshape(-1), h_rc.reshape(-1)], axis=-1)


def make_heightfield(heights, scale, origin) -> HeightField:
    heights = jnp.asarray(heights, jnp.float32)
    flat, fval = False, 0.0
    if os.environ.get("WTW_NO_FLAT_HF"):      # escape hatch: force gathers
        pass
    elif not isinstance(heights, jax.core.Tracer):
        h = np.asarray(heights)
        flat = bool(np.all(h == h.flat[0]))
        fval = float(h.flat[0]) if flat else 0.0
    return HeightField(
        heights=heights,
        horizontal_scale=jnp.float32(scale),
        origin=jnp.asarray(origin, jnp.float32),
        corners=pack_corners(heights),
        is_flat=flat, flat_value=fval)


def flat_heightfield(extent: float = 40.0, scale: float = 0.5) -> HeightField:
    n = int(extent / scale)
    return make_heightfield(jnp.zeros((n, n), jnp.float32), scale,
                            [-extent / 2, -extent / 2])


def _cell_coords(hf: HeightField, xy: jnp.ndarray):
    """Continuous cell coordinates, clipped inside the grid."""
    uv = (xy - hf.origin) / hf.horizontal_scale
    H, W = hf.heights.shape
    u = jnp.clip(uv[..., 0], 0.0, H - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, W - 1.001)
    return u, v


def _corner_gather(hf: HeightField, xy: jnp.ndarray):
    """4-corner bilinear support: ONE packed row gather per query point."""
    u, v = _cell_coords(hf, xy)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    W = hf.heights.shape[1]
    base = u0 * W + v0
    if hf.corners is not None:
        hc = jnp.take(hf.corners, base, axis=0)          # (..., 4)
    else:
        idx = jnp.stack([base, base + W, base + 1, base + W + 1], axis=-1)
        hc = jnp.take(hf.heights.reshape(-1), idx, axis=0)
    return hc[..., 0], hc[..., 1], hc[..., 2], hc[..., 3], du, dv


def height_at(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear terrain height at world xy; xy: (..., 2) -> (...)."""
    h00, h10, h01, h11, du, dv = _corner_gather(hf, xy)
    return (h00 * (1 - du) * (1 - dv) + h10 * du * (1 - dv)
            + h01 * (1 - du) * dv + h11 * du * dv)


def height_and_normal_at(hf: HeightField, xy: jnp.ndarray):
    """Height AND unit normal from the SAME 4 corner gathers: the bilinear
    patch has an analytic in-cell gradient, so no extra lookups
    (replaces height_at + central-difference normal_at on the hot path)."""
    h00, h10, h01, h11, du, dv = _corner_gather(hf, xy)
    h = (h00 * (1 - du) * (1 - dv) + h10 * du * (1 - dv)
         + h01 * (1 - du) * dv + h11 * du * dv)
    s = hf.horizontal_scale
    dhdx = ((h10 - h00) * (1 - dv) + (h11 - h01) * dv) / s
    dhdy = ((h01 - h00) * (1 - du) + (h11 - h10) * du) / s
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return h, n


def height_min3(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """min over the 3 nearest grid samples — exactly the reference's raycast
    semantics (legged_robot.py:1800-1804: min(h[px,py], h[px+1,py], h[px,py+1]))."""
    h00, h10, h01, _, _, _ = _corner_gather(hf, xy)
    return jnp.minimum(jnp.minimum(h00, h10), h01)


def normal_at(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Terrain unit normal from central differences; xy: (..., 2) -> (..., 3)."""
    s = hf.horizontal_scale
    eps = s
    dx = (height_at(hf, xy + jnp.array([eps, 0.0])) -
          height_at(hf, xy - jnp.array([eps, 0.0]))) / (2 * eps)
    dy = (height_at(hf, xy + jnp.array([0.0, eps])) -
          height_at(hf, xy - jnp.array([0.0, eps]))) / (2 * eps)
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
