"""Env-layer tests: shapes, stepping, determinism, resets, curriculum.

The analog of the reference smoke test (scripts/go1/test.py: build a small
world, step it, verify nothing explodes) plus the invariants the reference
never checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config, go1_mob_config
from wtw_tpu.envs import LeggedEnv
from wtw_tpu.models import load_robot


@pytest.fixture(scope="module")
def flat_env():
    cfg = go1_flat_config(num_envs=8)
    return LeggedEnv(cfg, load_robot("go1"))


@pytest.fixture(scope="module")
def flat_world(flat_env):
    return flat_env.init_state(jax.random.PRNGKey(0))


def test_shapes_flat(flat_env, flat_world):
    env, world = flat_env, flat_world
    world, obs_dict = env.get_observations(world)
    assert obs_dict["obs"].shape == (8, 42)
    assert obs_dict["privileged_obs"].shape == (8, 2)
    assert obs_dict["obs_history"].shape == (8, 15 * 42)

    step = jax.jit(env.step)
    world2, obs_dict, rew, done, info = step(
        world, jnp.zeros((8, 12)))
    assert rew.shape == (8,)
    assert done.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(obs_dict["obs"])))
    assert bool(jnp.all(jnp.isfinite(rew)))


def test_zero_action_rollout_stable(flat_env, flat_world):
    """Zero actions = PD to default pose; robots should mostly stay up for
    100 steps (2 s), like scripts/go1/test.py:198-200."""
    env, world = flat_env, flat_world
    step = jax.jit(env.step)

    def body(w, _):
        w, _, rew, done, _ = step(w, jnp.zeros((8, 12)))
        return w, (rew, done, w.env.phys.base_pos[:, 2])

    world, (rews, dones, heights) = jax.lax.scan(body, world, None, length=100)
    assert bool(jnp.all(jnp.isfinite(rews)))
    # most robots should stay standing (no terminal height configured here,
    # so check height band directly)
    final_h = np.asarray(heights[-1] - np.asarray(world.env.env_origin)[:, 2])
    assert np.mean((final_h > 0.15) & (final_h < 0.5)) > 0.7, final_h


def test_determinism(flat_env, flat_world):
    env, world = flat_env, flat_world
    step = jax.jit(env.step)
    a = jax.random.normal(jax.random.PRNGKey(1), (8, 12)) * 0.1

    def run(w):
        for _ in range(3):
            w, od, r, d, _ = step(w, a)
        return od["obs"], r

    o1, r1 = run(world)
    o2, r2 = run(world)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_commands_within_ranges(flat_env, flat_world):
    cmds = np.asarray(flat_world.env.commands)
    cfg = flat_env.cfg
    assert cmds.shape == (8, 3)
    assert np.all(cmds[:, 0] >= cfg.commands.limit_vel_x[0] - 0.1)
    assert np.all(cmds[:, 0] <= cfg.commands.limit_vel_x[1] + 0.1)


def test_mob_env_obs_layout():
    """MoB config: 70-dim obs = gravity(3)+cmds(15)+q(12)+qd(12)+a(12)+
    last_a(12)+clock(4) (scripts/go1/train.py:83-90)."""
    cfg = go1_mob_config(num_envs=4)
    cfg = cfg.__class__(**{**cfg.__dict__,
                           "control": cfg.control.__class__(control_type="P")})
    env = LeggedEnv(cfg, load_robot("go1"))
    world = env.init_state(jax.random.PRNGKey(0))
    world, obs_dict = env.get_observations(world)
    assert obs_dict["obs"].shape == (4, 70)
    assert obs_dict["privileged_obs"].shape == (4, 2)
    assert obs_dict["obs_history"].shape == (4, 30 * 70)
    # gait-category command shaping: phases in {0, 0.5} with binary_phases
    cmds = np.asarray(world.env.commands)
    assert np.all(np.isin(np.round(cmds[:, 5] * 2) / 2, [0.0, 0.5]))
    world2, od, rew, done, info = jax.jit(env.step)(
        world, jnp.zeros((4, 12)))
    assert bool(jnp.all(jnp.isfinite(od["obs"])))
    assert bool(jnp.all(jnp.isfinite(rew)))


def test_episode_reset_on_timeout(flat_env):
    cfg = go1_flat_config(num_envs=4)
    env = LeggedEnv(cfg, load_robot("go1"))
    world = env.init_state(jax.random.PRNGKey(3))
    # force timeout quickly
    world = world.replace(env=world.env.replace(
        episode_length=jnp.full((4,), env.max_episode_length, jnp.int32)))
    world2, od, rew, done, info = jax.jit(env.step)(world, jnp.zeros((4, 12)))
    assert bool(jnp.all(done))
    assert bool(jnp.all(info["time_outs"]))
    assert bool(jnp.all(world2.env.episode_length == 0))
    # episode sums were captured then cleared
    assert bool(jnp.all(world2.env.episode_sums == 0.0))


def test_sigma_anneal_schedule():
    """Annealed ji22 sigma: soft early, reference-sharp after the horizon
    (RewardsCfg.sigma_rew_neg_init docstring)."""
    import dataclasses
    from wtw_tpu.config import go1_flat_config
    from wtw_tpu.envs import make_legged_env

    cfg = go1_flat_config(num_envs=2)
    cfg = dataclasses.replace(cfg, rewards=dataclasses.replace(
        cfg.rewards, only_positive_rewards=False,
        only_positive_rewards_ji22_style=True,
        sigma_rew_neg=0.02, sigma_rew_neg_init=0.25,
        sigma_rew_neg_anneal_steps=10))
    env = make_legged_env(cfg, seed=0)
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    rewards = []
    for i in range(14):
        world, obs, rew, done, info = step(world, jnp.zeros((2, 12)))
        rewards.append(float(rew.mean()))
    # identical state dynamics with sharpening sigma -> rewards shrink as
    # the exp factor tightens; and everything stays finite past the horizon
    assert all(np.isfinite(rewards))
    assert rewards[-1] <= rewards[0] * 1.5  # no blow-up


def test_raibert_nominal_is_optimal_at_command():
    """The raibert heuristic must be MINIMIZED when the feet stand exactly
    at the commanded stance width/length on their own sides (FR/RR right =
    negative y). Guards the round-4 sign adjudication: the reference's
    ys_nom (corl_rewards.py:169-175) commands right feet to +w/2 under its
    FR-first foot order, whose optimum is a centerline squeeze — measured
    as stance width pinned at 0.125 m on the 100k policy."""
    from wtw_tpu.envs.rewards import RewardCtx, raibert_heuristic

    cfg = go1_mob_config(num_envs=1)
    w_cmd, l_cmd = 0.40, 0.40
    cmd = np.zeros(15, np.float32)
    cmd[4] = 3.0                    # freq (avoid div-by-zero)
    cmd[12], cmd[13] = w_cmd, l_cmd

    def ctx_with_feet(width):
        # feet on their own sides: FR/RR at -width/2, FL/RL at +width/2
        y = np.array([-width / 2, width / 2, -width / 2, width / 2])
        x = np.array([l_cmd / 2, l_cmd / 2, -l_cmd / 2, -l_cmd / 2])
        feet = jnp.asarray(np.stack([x, y, np.zeros(4)], axis=-1),
                           jnp.float32)
        z = jnp.zeros
        dummy12, dummy4 = z(12), z(4)
        return RewardCtx(
            base_pos=z(3), base_quat=jnp.array([0.0, 0, 0, 1.0]),
            base_lin_vel=z(3), base_ang_vel=z(3), projected_gravity=z(3),
            commands=jnp.asarray(cmd), joint_q=dummy12, joint_qd=dummy12,
            last_joint_qd=dummy12, torques=dummy12, actions=dummy12,
            last_actions=dummy12, last_last_actions=dummy12,
            joint_pos_target=dummy12, last_joint_pos_target=dummy12,
            last_last_joint_pos_target=dummy12, default_joint_q=dummy12,
            soft_pos_limits=jnp.zeros((12, 2)), foot_forces=jnp.zeros((4, 3)),
            foot_velocities=jnp.zeros((4, 3)),
            prev_foot_velocities=jnp.zeros((4, 3)),
            foot_positions=feet,
            # phases*0 offsets: foot_indices 0.5 -> phases = 0
            desired_contact_states=dummy4, foot_indices=jnp.full(4, 0.5),
            contact_filt=z(4, bool), thigh_contact=dummy4,
            calf_contact=dummy4, feet_air_time=dummy4,
            first_contact=z(4, bool), dt=jnp.float32(0.02),
            foot_side=jnp.array([-1.0, 1.0, -1.0, 1.0]))  # FR FL RR RL

    err_at_cmd = float(raibert_heuristic(ctx_with_feet(w_cmd), cfg))
    err_narrow = float(raibert_heuristic(ctx_with_feet(0.125), cfg))
    err_wide = float(raibert_heuristic(ctx_with_feet(0.55), cfg))
    # the commanded width is the optimum; both narrower and wider cost more
    assert err_at_cmd < 1e-9
    assert err_narrow > 0.01 and err_wide > 0.001
