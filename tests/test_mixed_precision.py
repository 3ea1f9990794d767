"""Mixed-precision (bf16 GEMM) path of the actor-critic.

The TPU perf path runs every network GEMM with bf16 inputs + fp32
accumulation and stores the rollout obs_history in bf16
(ACArgs.compute_dtype="bfloat16"); the reference computes the same math in
torch fp32 (go1_gym_learn/ppo_cse/actor_critic.py:19-147). These tests pin
(1) the split-first-layer GEMM is exactly the concat GEMM in fp32,
(2) bf16 outputs track fp32 within bf16 resolution, and
(3) a full train iteration runs finite end-to-end in bf16.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models import actor_critic as ac


def _params(key, n_obs=21, n_priv=6, n_hist=63, n_act=12):
    return ac.init_actor_critic(key, n_obs, n_priv, n_hist, n_act), \
        (n_obs, n_priv, n_hist, n_act)


def test_split_first_layer_matches_concat_fp32():
    params, (_, n_priv, n_hist, _) = _params(jax.random.PRNGKey(0))
    obs_h = jax.random.normal(jax.random.PRNGKey(1), (17, n_hist))
    priv = jax.random.normal(jax.random.PRNGKey(2), (17, n_priv))
    args = ac.ACArgs()
    # the pre-split formulation, recomputed directly
    x = jnp.concatenate([obs_h, priv], axis=-1)
    want = ac._apply_mlp(params["critic"], x, args.activation)[..., 0]
    got = ac.evaluate(params, obs_h, priv, args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    want_a = ac._apply_mlp(params["actor"],
                           jnp.concatenate([obs_h, priv], axis=-1),
                           args.activation)
    got_a = ac.actor_mean(params, obs_h, priv, args)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=1e-6, atol=1e-6)


def test_bf16_tracks_fp32():
    params, (_, n_priv, n_hist, _) = _params(jax.random.PRNGKey(3))
    obs_h = jax.random.normal(jax.random.PRNGKey(4), (33, n_hist))
    f32 = ac.ACArgs(compute_dtype="float32")
    bf16 = ac.ACArgs(compute_dtype="bfloat16")
    m32, _ = ac.distribution(params, obs_h, f32)
    m16, _ = ac.distribution(params, obs_h, bf16)
    assert m16.dtype == jnp.float32          # fp32 accumulation/output
    # bf16 has ~3 decimal digits; activations are O(1)
    np.testing.assert_allclose(np.asarray(m16), np.asarray(m32),
                               rtol=0.05, atol=0.05)
    lat32 = ac.adaptation_module(params, obs_h, f32)
    lat16 = ac.adaptation_module(params, obs_h, bf16)
    np.testing.assert_allclose(np.asarray(lat16), np.asarray(lat32),
                               rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_train_iteration_bf16(tmp_path):
    from wtw_tpu.config import go1_flat_config
    from wtw_tpu.envs import LeggedEnv
    from wtw_tpu.learn import PPOArgs, Runner, RunnerArgs
    from wtw_tpu.models import load_robot

    cfg = go1_flat_config(num_envs=8)
    env = LeggedEnv(cfg, load_robot("go1"))
    args = PPOArgs(num_steps_per_env=8, num_mini_batches=2,
                   num_learning_epochs=2)
    runner = Runner(env, args, ac_args=ac.ACArgs(compute_dtype="bfloat16"),
                    runner_args=RunnerArgs(run_dir=str(tmp_path), log_freq=1,
                                           save_interval=0))
    runner.learn(2, log_fn=lambda *a: None)
    flat = jax.tree.leaves(jax.device_get(runner.ts.params))
    assert all(np.all(np.isfinite(p)) for p in flat)
    assert all(p.dtype == np.float32 for p in flat)   # params stay fp32
