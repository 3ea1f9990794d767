"""On-device reward-threshold command curriculum.

Re-design of the reference's CPU/numpy grid curriculum
(go1_gym/envs/base/curriculum.py:17-154 + the gait-category machinery in
legged_robot.py:1299-1383, 710-824) as fixed-shape array ops so the whole
thing lives inside the jitted train step:

- the 15-dim command grid is flattened to `n_bins` cells; per gait category
  ('pronk','trot','pace','bound') a weight vector over cells;
- sampling = inverse-CDF over weights (replaces np.random.choice) + uniform
  jitter within the cell;
- update = scatter 0.2·(# successes adjacent to each cell) with a
  precomputed boolean adjacency matrix (the reference's `get_local_bins`
  box-neighborhood, curriculum.py:123-133), clipped to [0, 1].

The grid is static per config, built in numpy at env-construction time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import CommandsCfg

# command dims in grid order (= reference _init_command_distribution order,
# legged_robot.py:1310-1356)
DIM_NAMES = ("vel_x", "vel_y", "vel_yaw", "body_height", "gait_frequency",
             "gait_phase", "gait_offset", "gait_bound", "gait_duration",
             "footswing_height", "body_pitch", "body_roll", "stance_width",
             "stance_length", "aux_reward_coef")

# neighbor dilation ranges per dim (legged_robot.py:737-739)
LOCAL_RANGE = np.array([0.55, 0.55, 0.55, 0.55, 0.35, 0.25, 0.25, 0.25, 0.25,
                        1.0, 1.0, 1.0, 1.0, 1.0, 1.0])

CATEGORIES = ("pronk", "trot", "pace", "bound")


@struct.dataclass
class CurriculumGrid:
    """Static grid data (closed over by jit)."""
    centers: jnp.ndarray     # (n_dims, n_bins) cell centers
    bin_sizes: jnp.ndarray   # (n_dims,)
    adjacency: jnp.ndarray   # (n_bins, n_bins) float {0,1}
    lows: jnp.ndarray        # (n_dims,)
    highs: jnp.ndarray       # (n_dims,)


@struct.dataclass
class CurriculumState:
    weights: jnp.ndarray     # (n_categories, n_bins) in [0, 1]


def _limits_and_bins(cmd: CommandsCfg) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lims = np.array([
        cmd.limit_vel_x, cmd.limit_vel_y, cmd.limit_vel_yaw,
        cmd.limit_body_height, cmd.limit_gait_frequency, cmd.limit_gait_phase,
        cmd.limit_gait_offset, cmd.limit_gait_bound, cmd.limit_gait_duration,
        cmd.limit_footswing_height, cmd.limit_body_pitch, cmd.limit_body_roll,
        cmd.limit_stance_width, cmd.limit_stance_length,
        cmd.limit_aux_reward_coef])
    nbins = np.array([
        cmd.num_bins_vel_x, cmd.num_bins_vel_y, cmd.num_bins_vel_yaw,
        cmd.num_bins_body_height, cmd.num_bins_gait_frequency,
        cmd.num_bins_gait_phase, cmd.num_bins_gait_offset,
        cmd.num_bins_gait_bound, cmd.num_bins_gait_duration,
        cmd.num_bins_footswing_height, cmd.num_bins_body_pitch,
        cmd.num_bins_body_roll, cmd.num_bins_stance_width,
        cmd.num_bins_stance_length, cmd.num_bins_aux_reward_coef])
    return lims[:, 0], lims[:, 1], nbins


def initial_ranges(cmd: CommandsCfg) -> np.ndarray:
    """Initial command support (reference low/high at legged_robot.py:1364-1381)."""
    return np.array([
        cmd.lin_vel_x, cmd.lin_vel_y, cmd.ang_vel_yaw, cmd.body_height_cmd,
        cmd.gait_frequency_cmd_range, cmd.gait_phase_cmd_range,
        cmd.gait_offset_cmd_range, cmd.gait_bound_cmd_range,
        cmd.gait_duration_cmd_range, cmd.footswing_height_range,
        cmd.body_pitch_range, cmd.body_roll_range, cmd.stance_width_range,
        cmd.stance_length_range, cmd.aux_reward_coef_range])


def build_grid(cmd: CommandsCfg) -> CurriculumGrid:
    low, high, nbins = _limits_and_bins(cmd)
    bin_sizes = (high - low) / nbins
    axes = [np.linspace(low[d] + bin_sizes[d] / 2, high[d] - bin_sizes[d] / 2,
                        nbins[d]) for d in range(len(nbins))]
    mesh = np.meshgrid(*axes, indexing="ij")
    centers = np.stack([m.reshape(-1) for m in mesh])  # (n_dims, n_bins)

    diff = np.abs(centers[:, :, None] - centers[:, None, :])  # (d, n, n)
    adjacency = np.all(diff <= LOCAL_RANGE[:, None, None], axis=0)
    return CurriculumGrid(
        centers=jnp.asarray(centers, jnp.float32),
        bin_sizes=jnp.asarray(bin_sizes, jnp.float32),
        adjacency=jnp.asarray(adjacency, jnp.float32),
        lows=jnp.asarray(low, jnp.float32),
        highs=jnp.asarray(high, jnp.float32),
    )


def init_state(cmd: CommandsCfg, grid: CurriculumGrid) -> CurriculumState:
    """Weights 1.0 for cells whose center lies inside the initial command
    ranges (reference Curriculum.set_to, curriculum.py:18-26), per category."""
    rng = np.asarray(initial_ranges(cmd))
    centers = np.asarray(grid.centers)
    inside = np.all((centers >= rng[:, 0:1]) & (centers <= rng[:, 1:2]), axis=0)
    n_cat = len(CATEGORIES) if cmd.gaitwise_curricula else 1
    w = np.tile(inside.astype(np.float32), (n_cat, 1))
    return CurriculumState(weights=jnp.asarray(w))


def sample_commands(grid: CurriculumGrid, state: CurriculumState,
                    category: jnp.ndarray, key: jax.Array):
    """Sample one command vector + bin index from a category's weights.

    Inverse-CDF sampling (replaces rng.choice at curriculum.py:76-78) and
    uniform jitter within the cell (curriculum.py:82-85). Per-env; vmap it.
    """
    w = state.weights[category]
    cdf = jnp.cumsum(w)
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1) * cdf[-1]
    # searchsorted(cdf, r, 'right') as a compare+sum: under vmap, XLA lowers
    # batched searchsorted to a while loop over the 441-cell grid (~0.4 ms/
    # step at 4096 envs — profiled); the dense compare fuses to ~10 us
    bin_idx = jnp.sum((cdf <= r).astype(jnp.int32))
    bin_idx = jnp.clip(bin_idx, 0, w.shape[0] - 1)
    center = grid.centers[:, bin_idx]
    jitter = jax.random.uniform(k2, center.shape, minval=-0.5, maxval=0.5)
    cmd = center + jitter * grid.bin_sizes
    return cmd, bin_idx


def sample_commands_batched(grid: CurriculumGrid, state: CurriculumState,
                            categories: jnp.ndarray, keys: jax.Array):
    """Batched sample_commands for the hot path: (N,) categories + (N,) keys
    -> ((N, n_dims) commands, (N,) bins).

    Identical draws to vmap(sample_commands) (same key splits, same uniform
    calls), but restructured for the TPU: the per-category CDF is computed
    ONCE on the (n_cat, n_bins) weights instead of per env (vmapped cumsum
    lowered to ~65k flop/env — profiled at 2.4 ms/step at 4096 envs), and
    every per-env gather (weights row, cell center) becomes a one-hot
    matmul that rides the MXU instead of a serialized gather.
    """
    n_cat, n_bins = state.weights.shape
    cdf_all = jnp.cumsum(state.weights, axis=1)              # (n_cat, n_bins)
    cat_oh = jax.nn.one_hot(categories, n_cat, dtype=jnp.float32)
    cdf = cat_oh @ cdf_all                                   # (N, n_bins)
    ks = jax.vmap(lambda k: jax.random.split(k))(keys)       # (N, 2, 2)
    r = jax.vmap(jax.random.uniform)(ks[:, 0]) * cdf[:, -1]
    bin_idx = jnp.sum((cdf <= r[:, None]).astype(jnp.int32), axis=1)
    bin_idx = jnp.clip(bin_idx, 0, n_bins - 1)
    bin_oh = jax.nn.one_hot(bin_idx, n_bins, dtype=jnp.float32)
    center = bin_oh @ grid.centers.T                         # (N, n_dims)
    n_dims = grid.centers.shape[0]
    jitter = jax.vmap(lambda k: jax.random.uniform(
        k, (n_dims,), minval=-0.5, maxval=0.5))(ks[:, 1])
    cmd = center + jitter * grid.bin_sizes
    return cmd, bin_idx


def apply_gait_category_batched(commands: jnp.ndarray, category: jnp.ndarray,
                                binary_phases: bool) -> jnp.ndarray:
    """Batched apply_gait_category: (N, nc) commands + (N,) categories.
    The per-env `sel[category]` gathers (0.8 ms each at 4096 envs —
    profiled) become arithmetic one-hot selects that fuse to nothing."""
    phase, offset, bound = commands[:, 5], commands[:, 6], commands[:, 7]
    z = jnp.zeros_like(phase)
    p_sel = jnp.stack([(phase / 2 - 0.25) % 1.0, phase / 2 + 0.25, z, z], -1)
    o_sel = jnp.stack([(offset / 2 - 0.25) % 1.0, z, offset / 2 + 0.25, z], -1)
    b_sel = jnp.stack([(bound / 2 - 0.25) % 1.0, z, z, bound / 2 + 0.25], -1)
    cat_oh = jax.nn.one_hot(category, 4, dtype=commands.dtype)   # (N, 4)
    new_p = jnp.sum(p_sel * cat_oh, axis=-1)
    new_o = jnp.sum(o_sel * cat_oh, axis=-1)
    new_b = jnp.sum(b_sel * cat_oh, axis=-1)
    if binary_phases:
        new_p = (jnp.round(2 * new_p) / 2.0) % 1.0
        new_o = (jnp.round(2 * new_o) / 2.0) % 1.0
        new_b = (jnp.round(2 * new_b) / 2.0) % 1.0
    return commands.at[:, 5].set(new_p).at[:, 6].set(new_o) \
                   .at[:, 7].set(new_b)


def update_weights(grid: CurriculumGrid, state: CurriculumState,
                   env_category: jnp.ndarray, env_bin: jnp.ndarray,
                   success: jnp.ndarray, mask: jnp.ndarray,
                   axis_name: str | None = None) -> CurriculumState:
    """Dilate weights around successful bins (RewardThresholdCurriculum.update,
    curriculum.py:135-154): each success bumps its own bin and every adjacent
    bin by +0.2, clipped to [0, 1]. Vectorized over all envs at once.

    env_category: (N,) int, env_bin: (N,) int, success: (N,) bool,
    mask: (N,) bool — which envs are being resampled this step.
    """
    n_cat, n_bins = state.weights.shape
    contrib = (success & mask).astype(jnp.float32)              # (N,)
    onehot = jax.nn.one_hot(env_bin, n_bins) * contrib[:, None]  # (N, n_bins)
    cat_onehot = jax.nn.one_hot(env_category, n_cat)             # (N, n_cat)
    succ_per_cat_bin = cat_onehot.T @ onehot                     # (n_cat, n_bins)
    if axis_name is not None:
        # multi-device: one global curriculum — success counts are summed
        # over the env-sharded mesh axis so every shard applies the same
        # update and the replicated weights stay bitwise identical.
        succ_per_cat_bin = jax.lax.psum(succ_per_cat_bin, axis_name)
    # each success bumps its own bin (+0.2) and every adjacent bin (+0.2);
    # the adjacency box contains the bin itself, so the own bin effectively
    # gets +0.4 per success — matching the reference's two-pass update
    # (curriculum.py:148-154).
    bumps = succ_per_cat_bin + succ_per_cat_bin @ grid.adjacency  # (n_cat, n_bins)
    new_w = jnp.clip(state.weights + 0.2 * bumps, 0.0, 1.0)
    return CurriculumState(weights=new_w)


def apply_gait_category(commands: jnp.ndarray, category: jnp.ndarray,
                        binary_phases: bool) -> jnp.ndarray:
    """Per-category phase/offset/bound shaping (legged_robot.py:763-817,
    gaitwise_curricula branch) + binary phase rounding (:814-817)."""
    phase, offset, bound = commands[5], commands[6], commands[7]
    z = jnp.zeros_like(phase)
    # pronk: all three -> (x/2 - 0.25) % 1 ; trot: phase/2+0.25, others 0;
    # pace: offset/2+0.25; bound: bound/2+0.25
    p_sel = jnp.stack([(phase / 2 - 0.25) % 1.0, phase / 2 + 0.25, z, z])
    o_sel = jnp.stack([(offset / 2 - 0.25) % 1.0, z, offset / 2 + 0.25, z])
    b_sel = jnp.stack([(bound / 2 - 0.25) % 1.0, z, z, bound / 2 + 0.25])
    new_p = p_sel[category]
    new_o = o_sel[category]
    new_b = b_sel[category]
    if binary_phases:
        new_p = (jnp.round(2 * new_p) / 2.0) % 1.0
        new_o = (jnp.round(2 * new_o) / 2.0) % 1.0
        new_b = (jnp.round(2 * new_b) / 2.0) % 1.0
    return commands.at[5].set(new_p).at[6].set(new_o).at[7].set(new_b)
