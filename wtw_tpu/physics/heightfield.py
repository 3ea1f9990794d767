"""Heightfield terrain representation + queries.

Replaces both the PhysX static collider (gym.add_triangle_mesh, reference
legged_robot.py:1476) and the height raycast grid (`_get_heights`,
legged_robot.py:1772-1806). The reference only ever *queries* terrain
heights on a grid, so a heightfield (not a trimesh) is the native
representation here. One heightfield is shared by all envs on a device.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HeightField:
    heights: jnp.ndarray          # (H, W) float32 meters
    horizontal_scale: jnp.ndarray  # () meters per cell
    origin: jnp.ndarray           # (2,) world xy of cell (0, 0)

    @property
    def shape(self):
        return self.heights.shape


def flat_heightfield(extent: float = 40.0, scale: float = 0.5) -> HeightField:
    n = int(extent / scale)
    return HeightField(
        heights=jnp.zeros((n, n), jnp.float32),
        horizontal_scale=jnp.float32(scale),
        origin=jnp.array([-extent / 2, -extent / 2], jnp.float32),
    )


def _cell_coords(hf: HeightField, xy: jnp.ndarray):
    """Continuous cell coordinates, clipped inside the grid."""
    uv = (xy - hf.origin) / hf.horizontal_scale
    H, W = hf.heights.shape
    u = jnp.clip(uv[..., 0], 0.0, H - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, W - 1.001)
    return u, v


def height_at(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear terrain height at world xy; xy: (..., 2) -> (...)."""
    u, v = _cell_coords(hf, xy)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    h = hf.heights
    h00 = h[u0, v0]
    h10 = h[u0 + 1, v0]
    h01 = h[u0, v0 + 1]
    h11 = h[u0 + 1, v0 + 1]
    return (h00 * (1 - du) * (1 - dv) + h10 * du * (1 - dv)
            + h01 * (1 - du) * dv + h11 * du * dv)


def height_min3(hf: HeightField, xy: jnp.ndarray) -> jnp.ndarray:
    """min over the 3 nearest grid samples — exactly the reference's raycast
    semantics (legged_robot.py:1800-1804: min(h[px,py], h[px+1,py], h[px,py+1]))."""
    u, v = _cell_coords(hf, xy)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    h = hf.heights
    return jnp.minimum(jnp.minimum(h[u0, v0], h[u0 + 1, v0]), h[u0, v0 + 1])


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
