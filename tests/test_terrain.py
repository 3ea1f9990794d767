"""Terrain generation tests (SURVEY.md §4 'do better' plan: unit tests for
terrain as pure functions, CPU-runnable)."""
import dataclasses

import numpy as np
import pytest

from wtw_tpu.config import TerrainCfg, go1_flat_config
from wtw_tpu.terrain import (
    CEILING_OPEN, ParkourTerrainCfg, assign_env_origins,
    assign_parkour_origins, build_parkour, build_terrain, to_heightfield,
    ceiling_heightfield)


def small_cfg(**kw):
    base = dict(mesh_type="heightfield", curriculum=True, num_rows=4,
                num_cols=5, terrain_length=4.0, terrain_width=4.0,
                border_size=2.0, horizontal_scale=0.1,
                terrain_proportions=(0.2, 0.2, 0.2, 0.0, 0.2, 0.2, 0, 0, 0))
    base.update(kw)
    return TerrainCfg(**base)


def test_build_shapes_and_origins():
    cfg = small_cfg()
    tm = build_terrain(cfg, seed=0)
    L = int(cfg.terrain_length / cfg.horizontal_scale)
    W = int(cfg.terrain_width / cfg.horizontal_scale)
    b = int(cfg.border_size / cfg.horizontal_scale)
    assert tm.heights.shape == (4 * L + 2 * b, 5 * W + 2 * b)
    assert tm.env_origins.shape == (4, 5, 3)
    # origins at cell centers in world coords
    assert np.allclose(tm.env_origins[0, 0, :2], [2.0, 2.0])
    assert np.allclose(tm.env_origins[3, 4, :2], [14.0, 18.0])
    # origin z >= 0 (max height of cell)
    assert (tm.env_origins[..., 2] >= 0).all()


def test_determinism():
    cfg = small_cfg()
    a = build_terrain(cfg, seed=7)
    b = build_terrain(cfg, seed=7)
    c = build_terrain(cfg, seed=8)
    assert np.array_equal(a.heights, b.heights)
    # different seed -> different randomized features (rough slopes etc.)
    assert not np.array_equal(a.heights, c.heights)


def test_difficulty_increases_with_row():
    """Rows = difficulty: stairs-up column must get taller with row index
    (curriculum layout, go1_gym/utils/terrain.py:90-98)."""
    cfg = small_cfg(num_rows=6,
                    terrain_proportions=(0, 0, 0, 1.0, 0, 0, 0, 0, 0))
    tm = build_terrain(cfg, seed=0)
    L = int(cfg.terrain_length / cfg.horizontal_scale)
    b = int(cfg.border_size / cfg.horizontal_scale)
    maxes = [tm.heights[b + i * L: b + (i + 1) * L].max() for i in range(6)]
    assert maxes[-1] > maxes[1]


def test_eval_rows_appended():
    cfg = small_cfg()
    ev = small_cfg(num_rows=2)
    tm = build_terrain(cfg, seed=0, eval_cfg=ev)
    assert tm.env_origins.shape[0] == 6
    assert tm.num_eval_rows == 2


def test_assign_env_origins_center_robots():
    cfg = small_cfg(num_rows=8, num_cols=8, center_robots=True, center_span=2)
    tm = build_terrain(cfg, seed=0)
    origins, levels, types = assign_env_origins(tm, 64, cfg, seed=0)
    assert origins.shape == (64, 3)
    assert levels.min() >= 2 and levels.max() <= 5
    assert types.min() >= 2 and types.max() <= 5


def test_parkour_build():
    cfg = ParkourTerrainCfg(num_levels=3, num_terrains=5, map_length=12.0,
                            map_width=4.0, border_size=4.0)
    tm = build_parkour(cfg, seed=0)
    assert tm.ceilings.shape == (3, 5)
    assert tm.ceilings_grid is not None
    # crawl column (last of 5 with equal proportions) has a lowered ceiling
    # that decreases with difficulty (terrainParkour.py:191)
    crawl_col = 4
    assert tm.ceilings[0, crawl_col] == pytest.approx(0.34)
    assert tm.ceilings[2, crawl_col] < tm.ceilings[0, crawl_col]
    # non-crawl columns keep the default 0.4 ceiling
    assert np.allclose(tm.ceilings[:, :4], 0.4)
    # lava moats exist: some cells well below ground
    assert tm.heights.min() <= -0.7
    # ceilings grid open almost everywhere, lowered under crawl barriers
    assert (tm.ceilings_grid == CEILING_OPEN).mean() > 0.9
    assert tm.ceilings_grid.min() < 0.4
    # origins at track start x = i * map_length
    assert np.allclose(tm.env_origins[1, 0, 0], 12.0)


def test_parkour_origin_assignment():
    cfg = ParkourTerrainCfg(num_levels=3, num_terrains=4,
                            max_init_map_level=1)
    tm = build_parkour(cfg, seed=0)
    origins, levels, types = assign_parkour_origins(tm, 16, cfg, seed=0)
    assert levels.max() <= 1
    # types striped over columns: first quarter of envs in column 0
    assert (types[:4] == 0).all() and (types[-4:] == 3).all()


def test_heightfield_roundtrip():
    """Terrain -> HeightField query agrees with the raw array at cell
    centers."""
    import jax
    from wtw_tpu.physics.heightfield import height_at

    cfg = small_cfg(terrain_proportions=(0, 0, 0, 1.0, 0, 0, 0, 0, 0))
    tm = build_terrain(cfg, seed=0)
    hf = to_heightfield(tm)
    i, j = 30, 40
    xy = tm.origin + np.array([i, j]) * tm.horizontal_scale
    h = jax.jit(height_at)(hf, xy.astype(np.float32))
    assert float(h) == pytest.approx(tm.heights[i, j], abs=1e-5)


def test_make_env_with_terrain_steps():
    """End-to-end: heightfield env builds and steps without NaN."""
    import jax
    import jax.numpy as jnp
    from wtw_tpu.envs import make_legged_env

    cfg = go1_flat_config(num_envs=4)
    cfg = dataclasses.replace(cfg, terrain=small_cfg(
        num_rows=3, num_cols=3, center_robots=False,
        max_init_terrain_level=1,
        terrain_proportions=(0, 0, 0, 0, 0, 0, 0, 0, 1.0)))
    env = make_legged_env(cfg, seed=0)
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        world, obs, rew, done, info = step(
            world, jnp.zeros((4, env.num_actions)))
    assert bool(jnp.isfinite(obs["obs"]).all())
    assert bool(jnp.isfinite(rew).all())
