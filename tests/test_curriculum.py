"""Command-curriculum unit tests (go1_gym/envs/base/curriculum.py
semantics: set_to init, weighted sampling, neighbor-dilation updates,
gait-category shaping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import CommandsCfg
from wtw_tpu.envs import curriculum as C


def small_cmd():
    # 21 bins over (-5, 5) like the reference (scripts/go1/train.py:183-196):
    # bin size 0.476 < the 0.55 neighbor-dilation range, so success can
    # open adjacent bins
    return CommandsCfg(
        num_commands=3, num_bins_vel_x=21, num_bins_vel_y=1,
        num_bins_vel_yaw=21, limit_vel_x=(-5, 5), limit_vel_yaw=(-5, 5),
        lin_vel_x=(-1, 1), ang_vel_yaw=(-1, 1), gaitwise_curricula=False)


def test_init_weights_inside_initial_ranges():
    cmd = small_cmd()
    grid = C.build_grid(cmd)
    state = C.init_state(cmd, grid)
    centers = np.asarray(grid.centers)
    w = np.asarray(state.weights[0])
    # active cells have |vx| <= 1 and |wz| <= 1 (set_to, curriculum.py:18-26)
    assert ((np.abs(centers[0, w > 0]) <= 1.0 + 1e-6).all())
    assert ((np.abs(centers[2, w > 0]) <= 1.0 + 1e-6).all())
    assert w.sum() > 0
    # cells outside the initial range are off
    far = np.abs(centers[0]) > 2.0
    assert (w[far] == 0).all()


def test_samples_respect_weights():
    cmd = small_cmd()
    grid = C.build_grid(cmd)
    state = C.init_state(cmd, grid)
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    cmds, bins = jax.vmap(
        lambda k: C.sample_commands(grid, state, jnp.int32(0), k))(keys)
    # every sample comes from an active bin
    w = np.asarray(state.weights[0])
    assert (w[np.asarray(bins)] > 0).all()
    # and lies within the grid cell jitter of the initial range
    assert float(jnp.abs(cmds[:, 0]).max()) <= 1.0 + float(grid.bin_sizes[0])


def test_update_dilates_neighbors():
    cmd = small_cmd()
    grid = C.build_grid(cmd)
    state = C.init_state(cmd, grid)
    active_before = int((state.weights[0] > 0).sum())
    # a successful env at a boundary bin of the initial range
    centers = np.asarray(grid.centers)
    w0 = np.asarray(state.weights[0])
    # rightmost active vx bin
    act_idx = np.where(w0 > 0)[0]
    edge_bin = act_idx[np.argmax(centers[0, act_idx])]
    new_state = C.update_weights(
        grid, state,
        env_category=jnp.zeros(1, jnp.int32),
        env_bin=jnp.array([edge_bin], jnp.int32),
        success=jnp.array([True]),
        mask=jnp.array([True]))
    active_after = int((new_state.weights[0] > 0).sum())
    assert active_after > active_before      # dilation opened new bins
    # failure changes nothing
    same = C.update_weights(
        grid, state, jnp.zeros(1, jnp.int32),
        jnp.array([edge_bin], jnp.int32), jnp.array([False]),
        jnp.array([True]))
    assert (np.asarray(same.weights) == np.asarray(state.weights)).all()


def test_gait_category_shaping():
    """apply_gait_category (legged_robot.py:763-817): trot sets phase only,
    pace offset only, bound bound only; binary rounding to {0, 0.5}."""
    cmd = jnp.zeros(15).at[5].set(0.6).at[6].set(0.6).at[7].set(0.6)
    trot = C.apply_gait_category(cmd, jnp.int32(1), binary_phases=True)
    assert float(trot[5]) in (0.0, 0.5) and float(trot[6]) == 0.0 \
        and float(trot[7]) == 0.0
    pace = C.apply_gait_category(cmd, jnp.int32(2), binary_phases=True)
    assert float(pace[5]) == 0.0 and float(pace[6]) in (0.0, 0.5)
    bound = C.apply_gait_category(cmd, jnp.int32(3), binary_phases=True)
    assert float(bound[7]) in (0.0, 0.5)


def test_batched_sampler_matches_vmap():
    """The TPU hot-path batched sampler (one-hot matmuls, shared CDF) must
    reproduce vmap(sample_commands) exactly: same key splits, same draws,
    same bins."""
    cmd = small_cmd()
    grid = C.build_grid(cmd)
    state = C.init_state(cmd, grid)
    # make weights non-trivial so CDF order matters
    state = C.CurriculumState(
        weights=state.weights * jnp.linspace(0.2, 1.0, state.weights.shape[1]))
    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    cats = jax.random.randint(jax.random.PRNGKey(4), (512,), 0,
                              state.weights.shape[0])
    cmds_v, bins_v = jax.vmap(
        lambda c, k: C.sample_commands(grid, state, c, k))(cats, keys)
    cmds_b, bins_b = C.sample_commands_batched(grid, state, cats, keys)
    assert (np.asarray(bins_v) == np.asarray(bins_b)).all()
    np.testing.assert_allclose(np.asarray(cmds_v), np.asarray(cmds_b),
                               rtol=0, atol=1e-6)


def test_batched_gait_category_matches_scalar():
    cmds = jax.random.uniform(jax.random.PRNGKey(5), (64, 15), minval=-1,
                              maxval=1)
    cats = jax.random.randint(jax.random.PRNGKey(6), (64,), 0, 4)
    for binary in (False, True):
        one = jax.vmap(
            lambda c, g: C.apply_gait_category(c, g, binary))(cmds, cats)
        bat = C.apply_gait_category_batched(cmds, cats, binary)
        np.testing.assert_allclose(np.asarray(one), np.asarray(bat), atol=1e-6)
