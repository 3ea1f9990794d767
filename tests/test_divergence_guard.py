"""Divergence guard (ParkourCfg.divergence_*): a blown-up physics state
for one env must not leak NaN into rewards, constraints, the CaT running
maxes, or the next observations — it terminates and resets that env.

Regression test for the round-2 parkour NaN collapse: one diverged env at
iteration ~84 (4096-env TPU run) poisoned the constraint running maxes and
the obs normalizer, NaN-ing the whole learner within one iteration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
from wtw_tpu.models import load_robot
from wtw_tpu.terrain import ParkourTerrainCfg


@pytest.fixture(scope="module")
def env_world():
    cfg = ParkourCfg(num_envs=8,
                     terrain=ParkourTerrainCfg(easy_mode=True))
    env = ParkourEnv(cfg, load_robot(cfg.robot), seed=0)
    world = env.init_state(jax.random.PRNGKey(0))
    return env, world


def _poison(world, idx, value):
    phys = world.env.phys
    blv = phys.base_lin_vel.at[idx].set(value)
    qd = phys.joint_qd.at[idx].set(value)
    return world.replace(env=world.env.replace(
        phys=phys.replace(base_lin_vel=blv, joint_qd=qd)))


@pytest.mark.parametrize("value", [jnp.nan, jnp.inf, 1e6])
def test_diverged_env_is_terminated_and_sanitized(env_world, value):
    env, world = env_world
    world = _poison(world, 3, value)
    actions = jnp.zeros((8, env.num_actions))
    world2, obs, rew, done_prob, info = jax.jit(env.step)(world, actions)

    # reward stream clean, diverged env contributes zero
    assert np.isfinite(np.asarray(rew)).all()
    assert float(rew[3]) == 0.0
    # terminated (hard done + done probability 1)
    assert bool(info["true_dones"][3])
    assert float(done_prob[3]) == 1.0
    # CaT running maxes stay finite (they carry across the whole run)
    for leaf in jax.tree_util.tree_leaves(world2.cat):
        assert np.isfinite(np.asarray(leaf)).all()
    # constraint violations logged this step are finite
    for name, v in info["constraint_violations"].items():
        assert np.isfinite(np.asarray(v)).all(), name
    # next state fully reset to finite values
    for leaf in jax.tree_util.tree_leaves(world2.env.phys):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(obs)).all()


def test_healthy_envs_unaffected(env_world):
    env, world = env_world
    actions = jnp.zeros((8, env.num_actions))
    step = jax.jit(env.step)
    w_ref, _, rew_ref, _, _ = step(world, actions)
    w_poi, _, rew_poi, _, _ = step(_poison(world, 3, jnp.nan), actions)
    # the other 7 envs produce bit-identical rewards and physics
    np.testing.assert_array_equal(np.asarray(rew_ref[:3]),
                                  np.asarray(rew_poi[:3]))
    np.testing.assert_array_equal(np.asarray(rew_ref[4:]),
                                  np.asarray(rew_poi[4:]))
    for a, b in zip(jax.tree_util.tree_leaves(w_ref.env.phys),
                    jax.tree_util.tree_leaves(w_poi.env.phys)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(a[np.arange(8) != 3],
                                      b[np.arange(8) != 3])
