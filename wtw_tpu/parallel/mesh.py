"""Multi-device / multi-host scaling.

The TPU-native replacement for the reference's dormant torchrun/NCCL path
(utils/isaacgymenvs_make.py:140-156, cfg/config.yaml multi_gpu) — SURVEY.md
§2.7:

- one 1-D device mesh with axis 'env' (a 'model' axis is deliberately NOT
  needed: policies are <1M params; reserve it later if transformer policies
  arrive);
- environment state sharded along 'env' (each device simulates its slice —
  zero cross-device traffic in physics, since envs are independent);
- learner fully replicated; gradients pmean'd over ICI (see
  learn/ppo_cse.make_train_fns(axis_name=...));
- the global curriculum is replicated, with success counts psum'd so every
  shard applies identical updates.

For multi-host: call jax.distributed.initialize() before building the mesh;
jax.devices() then spans all hosts and everything below works unchanged.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "env"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def _is_spec(x):
    return isinstance(x, P)


def world_specs(world) -> Any:
    """PartitionSpec pytree for a WorldState: env leaves sharded on the env
    axis; curriculum / gravity / step counter replicated."""
    env_specs = jax.tree.map(lambda _: P(AXIS), world.env)
    curr_specs = jax.tree.map(lambda _: P(), world.curriculum)
    return world.replace(
        env=env_specs, curriculum=curr_specs,
        obs_history=P(AXIS), gravity_offset=P(), common_step=P())


def _place(mesh: Mesh, tree, specs):
    leaves, treedef = jax.tree.flatten(tree)
    spec_leaves = jax.tree.flatten(specs, is_leaf=_is_spec)[0]
    assert len(leaves) == len(spec_leaves)
    placed = [jax.device_put(x, NamedSharding(mesh, s))
              for x, s in zip(leaves, spec_leaves)]
    return jax.tree.unflatten(treedef, placed)


def shard_world(mesh: Mesh, world, obs_dict):
    """Place an (already batched) world + obs dict onto the mesh."""
    world = _place(mesh, world, world_specs(world))
    obs_dict = {k: jax.device_put(v, NamedSharding(mesh, P(AXIS)))
                for k, v in obs_dict.items()}
    return world, obs_dict


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def make_distributed_train_fn(env, args, ac_args, mesh: Mesh, ts, world,
                              obs_dict):
    """shard_map'd train iteration: envs sharded over AXIS, learner
    replicated, grads pmean'd. `ts/world/obs_dict` are structure templates
    (used for spec trees and abstract shape inference only)."""
    from ..learn.ppo_cse import make_train_fns

    train_fn = make_train_fns(env, args, ac_args, axis_name=AXIS)
    # same output structure, no collectives — for eval_shape only (the env
    # may itself carry an axis_name for its internal psums, which would be
    # unbound outside shard_map)
    import copy
    env_local = copy.copy(env)
    env_local.axis_name = None
    train_fn_local = make_train_fns(env_local, args, ac_args, axis_name=None)

    ts_specs = jax.tree.map(lambda _: P(), ts)
    w_specs = world_specs(world)
    obs_specs = {k: P(AXIS) for k in obs_dict}

    out_shape = jax.eval_shape(train_fn_local, ts, world, obs_dict)
    stats_specs = jax.tree.map(lambda _: P(), out_shape[3])
    out_specs = (ts_specs, w_specs, obs_specs, stats_specs)

    sharded = jax.shard_map(train_fn, mesh=mesh,
                            in_specs=(ts_specs, w_specs, obs_specs),
                            out_specs=out_specs)
    return jax.jit(sharded)


def parkour_world_specs(world) -> Any:
    """PartitionSpec tree for a ParkourWorld: env leaves + obs history
    sharded; CaT running maxes / soft_p curriculum / step counter
    replicated (they are psum/pmax-synchronized inside the step)."""
    env_specs = jax.tree.map(lambda _: P(AXIS), world.env)
    cat_specs = jax.tree.map(lambda _: P(), world.cat)
    return world.replace(env=env_specs, cat=cat_specs,
                         soft_p_progress=P(), hist_obs=P(AXIS),
                         common_step=P())


def make_distributed_cat_train_fn(env, args, mesh: Mesh, ts, world, obs):
    """shard_map'd cat_ppo iteration (Stack B multi-chip): envs + replay
    observations sharded over AXIS, learner/normalizers replicated, grads
    pmean'd; the env's CaT batch-max is pmax'd (CaTManager axis_name)."""
    from ..learn.cat_ppo import make_train_fn

    train_fn = make_train_fn(env, args, axis_name=AXIS)
    import copy
    env_local = copy.copy(env)
    env_local.axis_name = None
    if getattr(env_local, "cstr", None) is not None:
        env_local.cstr = copy.copy(env_local.cstr)
        env_local.cstr.axis_name = None
    train_fn_local = make_train_fn(env_local, args, axis_name=None)

    # per-env done carries live in the TrainState: shard them
    ts_specs = jax.tree.map(lambda _: P(), ts)
    ts_specs = ts_specs.replace(next_done=P(AXIS), next_true_done=P(AXIS))
    w_specs = parkour_world_specs(world)
    obs_specs = P(AXIS)

    out_shape = jax.eval_shape(train_fn_local, ts, world, obs)
    stats_specs = jax.tree.map(lambda _: P(), out_shape[3])
    out_specs = (ts_specs, w_specs, obs_specs, stats_specs)

    sharded = jax.shard_map(train_fn, mesh=mesh,
                            in_specs=(ts_specs, w_specs, obs_specs),
                            out_specs=out_specs)
    return jax.jit(sharded)


def shard_parkour_world(mesh: Mesh, world, obs):
    world = _place(mesh, world, parkour_world_specs(world))
    obs = jax.device_put(obs, NamedSharding(mesh, P(AXIS)))
    return world, obs
