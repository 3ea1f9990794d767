"""Terrain generation (host-side, build time).

- generators: sub-terrain primitives (replaces isaacgym.terrain_utils)
- stack_a: curriculum grid of sub-terrains (go1_gym/utils/terrain.py)
- parkour: parkour tracks with lava + ceilings (tasks/terrainParkour.py)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..physics.heightfield import HeightField, make_heightfield
from .parkour import CEILING_OPEN, ParkourTerrainCfg, assign_parkour_origins, build_parkour
from .stack_a import TerrainMap, assign_env_origins, build_terrain


def to_heightfield(tm: TerrainMap) -> HeightField:
    return make_heightfield(tm.heights, tm.horizontal_scale, tm.origin)


def ceiling_heightfield(tm: TerrainMap) -> HeightField:
    assert tm.ceilings_grid is not None, "not a parkour terrain"
    return make_heightfield(tm.ceilings_grid, tm.horizontal_scale, tm.origin)


__all__ = [
    "CEILING_OPEN", "HeightField", "ParkourTerrainCfg", "TerrainMap",
    "assign_env_origins", "assign_parkour_origins", "build_parkour",
    "build_terrain", "ceiling_heightfield", "to_heightfield",
]
