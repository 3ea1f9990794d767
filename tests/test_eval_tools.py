"""Eval metrics, DR sweeps, metric caches, actuator-net training tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config
from wtw_tpu.envs import make_legged_env
from wtw_tpu.learn.eval_metrics import (DR_SWEEPS, base_set,
                                        evaluate_policy, rand_large)
from wtw_tpu.learn.metrics_caches import DistCache, SlotCache


def test_dr_sweeps_mutate_cfg():
    cfg = go1_flat_config()
    for name, fn in DR_SWEEPS.items():
        out = fn(base_set(cfg))
        assert out.commands.resampling_time == 1e9
        assert out.env.episode_length_s == 500.0
    assert rand_large(cfg).domain_rand.friction_range == (0.04, 6.0)
    assert DR_SWEEPS["static_high"](cfg).domain_rand.friction_range \
        == (4.0, 4.01)


def test_evaluate_policy_runs():
    env = make_legged_env(go1_flat_config(num_envs=4), seed=0)
    policy = lambda obs: jnp.zeros((4, env.num_actions))
    summary, traces = evaluate_policy(env, policy, steps=5, seed=0,
                                      commands=np.array([1.0, 0.0, 0.0]))
    for key in ("lin_vel_rmsd", "CoT", "max_torques", "power_consumption",
                "froude_number", "mean_reward"):
        assert key in summary and np.isfinite(summary[key]), key
    # zero-action policy can't track 1 m/s: rmsd stays near 1
    assert summary["lin_vel_rmsd"] > 0.5
    assert traces["lin_vel_x"].shape == (5, 4)


def test_dist_cache():
    c = DistCache()
    c.log(a=1.0)
    c.log(a=3.0)
    s = c.get_summary()
    assert s["a"] == pytest.approx(2.0)
    assert c.get_summary() == {}     # cleared


def test_slot_cache():
    c = SlotCache(4)
    c.log(np.array([0, 0, 2]), rew=np.array([1.0, 3.0, 5.0]))
    s = c.get_summary()
    assert s["rew"][0] == pytest.approx(2.0)
    assert s["rew"][2] == pytest.approx(5.0)
    assert s["rew"][1] == 0.0


def test_actuator_training_fits_synthetic():
    """Training must fit a synthetic actuator law (tau = 25*err - 0.6*vel
    with saturation) well within the reference's tolerance."""
    from wtw_tpu.learn.actuator_train import (build_features,
                                              train_actuator_network)

    rng = np.random.default_rng(0)
    T, nj = 2000, 12
    q_target = rng.normal(size=(T, nj)).astype(np.float32) * 0.3
    q = q_target + rng.normal(size=(T, nj)).astype(np.float32) * 0.1
    qd = rng.normal(size=(T, nj)).astype(np.float32) * 2.0
    x = build_features(q_target, q, qd)
    err, vel = x[..., 0], x[..., 3]
    tau = np.clip(25.0 * err - 0.6 * vel, -20, 20)
    xs = x.reshape(-1, 6)
    ys = tau.reshape(-1)
    params, mae = train_actuator_network(xs, ys, epochs=30, log_fn=lambda s: None)
    assert mae < 0.5, f"actuator net did not fit, mae={mae}"


def test_converted_actuator_net_available():
    """The converted reference nets ship with the package and load."""
    from wtw_tpu.models.actuator_net import apply_actuator_net, load_actuator_net

    for name in ("actuator_go1", "actuator_go2", "actuator_go2_sim"):
        p = load_actuator_net(name)
        tau = apply_actuator_net(p, *([jnp.zeros(12)] * 6))
        assert tau.shape == (12,)
        assert bool(jnp.isfinite(tau).all())


def test_classify_contacts_gait_templates():
    """Synthetic square-wave contact sequences must classify to their gait
    and recover the stride frequency (foot order FR FL RR RL)."""
    from wtw_tpu.learn.eval_metrics import classify_contacts

    dt, T, N = 0.02, 400, 3
    t = np.arange(T) * dt
    f_hz = 2.5
    base = (np.sin(2 * np.pi * f_hz * t) > 0).astype(np.float32)   # duty 0.5
    anti = 1.0 - base
    # phase assignment per gait: which feet move with `base` vs `anti`
    gaits = {
        "trot": (base, anti, anti, base),    # FR+RL in phase
        "pace": (base, anti, base, anti),    # same-side pairs in phase
        "bound": (base, base, anti, anti),   # front pair vs hind pair
        "pronk": (base, base, base, base),   # all four together
    }
    for name, feet in gaits.items():
        c = np.stack(feet, axis=-1)[:, None, :].repeat(N, axis=1)
        out = classify_contacts(c, dt)
        assert out["dominant_gait"] == name, (name, out)
        assert abs(out["stride_freq_hz"] - f_hz) < 0.2, (name, out)
        assert abs(np.mean(out["duty_factor"]) - 0.5) < 0.05
    # trot axes have the expected signs
    out = classify_contacts(np.stack(gaits["trot"], -1)[:, None, :], dt)
    assert out["diag_corr"] > 0.9 and out["pair_corr"] < -0.9 \
        and out["side_corr"] < -0.9
