"""Learner-variant tests: RMA (go1_gym_learn/ppo), PPO+ (algos/PPO_plus.py),
PPORNN (algos/PPORNN.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config
from wtw_tpu.envs import make_legged_env
from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
from wtw_tpu.models import load_robot
from wtw_tpu.terrain import ParkourTerrainCfg


@pytest.fixture(scope="module")
def flat_env():
    return make_legged_env(go1_flat_config(num_envs=8), seed=0)


@pytest.fixture(scope="module")
def parkour_env():
    cfg = ParkourCfg(num_envs=8, terrain=ParkourTerrainCfg(
        num_levels=2, num_terrains=3, border_size=4.0))
    return ParkourEnv(cfg, load_robot("go2"), seed=0)


def test_rma_smoke_train(flat_env):
    from wtw_tpu.learn import ppo_rma
    from wtw_tpu.learn.ppo_cse import PPOArgs

    env = flat_env
    args = PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                   num_learning_epochs=1)
    world = env.init_state(jax.random.PRNGKey(0))
    world, obs = env.get_observations(world)
    ts = ppo_rma.init_train_state(jax.random.PRNGKey(1), env, args)
    train = jax.jit(ppo_rma.make_train_fn(env, args))
    for _ in range(3):
        ts, world, obs, stats = train(ts, world, obs)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["adaptation_loss"]))


def test_rma_adaptation_regresses_onto_encoder():
    """The adaptation substep must descend MSE(adapt(obs_h), sg(encode(priv)))
    on a fixed batch (ppo/ppo.py:156-164 semantics)."""
    import optax
    from wtw_tpu.learn.ppo_rma import RMAArgs, adapt, encode, init_rma

    rma = RMAArgs()
    params = init_rma(jax.random.PRNGKey(0), 42, 6, 420, 12, rma)
    oh = jax.random.normal(jax.random.PRNGKey(1), (64, 420))
    priv = jax.random.normal(jax.random.PRNGKey(2), (64, 6))

    def loss_fn(p):
        target = jax.lax.stop_gradient(encode(p, priv, rma))
        return jnp.mean((adapt(p, oh, rma) - target) ** 2)

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    l0 = float(loss_fn(params))

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(50):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5 * l0


def test_rma_latent_dims():
    from wtw_tpu.learn.ppo_rma import RMAArgs, init_rma, encode, adapt
    p = init_rma(jax.random.PRNGKey(0), 42, 6, 420, 12, RMAArgs())
    lat_t = encode(p, jnp.zeros((3, 6)))
    lat_s = adapt(p, jnp.zeros((3, 420)))
    assert lat_t.shape == (3, 18) and lat_s.shape == (3, 18)


def test_ppo_plus_action_improvement_moves_toward_q():
    """Zeroth-order refinement must increase Q on average."""
    from wtw_tpu.learn.cat_ppo_plus import (PPOPlusArgs, improve_actions,
                                            init_plus_agent, q_value)

    args = PPOPlusArgs(n_perturbations=64, sigma=0.1, alpha=0.5,
                       num_improvement_steps=3)
    params = init_plus_agent(jax.random.PRNGKey(0), 8, 4, args)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    a0 = jax.random.normal(jax.random.PRNGKey(2), (16, 4))
    a1 = improve_actions(params, jax.random.PRNGKey(3), obs, a0, args)
    q0 = q_value(params, obs, a0).mean()
    q1 = q_value(params, obs, a1).mean()
    assert float(q1) > float(q0)


def test_ppo_plus_smoke(parkour_env):
    from wtw_tpu.learn import cat_ppo_plus
    from wtw_tpu.learn.cat_ppo import rms_norm, rms_update

    env = parkour_env
    args = cat_ppo_plus.PPOPlusArgs(num_steps=4, num_minibatches=2,
                                    update_epochs=1, num_iterations=10,
                                    n_perturbations=4)
    world = env.init_state(jax.random.PRNGKey(0))
    ts = cat_ppo_plus.init_train_state(jax.random.PRNGKey(1), env, args)
    obs = env.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    train = jax.jit(cat_ppo_plus.make_train_fn(env, args))
    for _ in range(2):
        ts, world, obs_n, stats = train(ts, world, obs_n)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["q_loss"]))


def test_gru_cell_matches_torch():
    """Our GRU gating must match torch.nn.GRU bit-for-bit (weights trained
    here deploy onto torch on the robot)."""
    torch = pytest.importorskip("torch")
    from wtw_tpu.learn.cat_ppornn import gru_cell, init_gru

    p = init_gru(jax.random.PRNGKey(0), 5, 7)
    g = torch.nn.GRU(5, 7, batch_first=True)
    with torch.no_grad():
        g.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"]).T))
        g.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"]).T))
        g.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
        g.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
    x = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    h = np.random.default_rng(1).normal(size=(3, 7)).astype(np.float32)
    ours = np.asarray(gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
    with torch.no_grad():
        theirs, _ = g(torch.tensor(x).unsqueeze(1),
                      torch.tensor(h).unsqueeze(0))
    np.testing.assert_allclose(ours, theirs.squeeze(1).numpy(), atol=1e-5)


def test_ppornn_smoke(parkour_env):
    from wtw_tpu.learn import cat_ppornn
    from wtw_tpu.learn.cat_ppo import rms_norm, rms_update

    env = parkour_env
    args = cat_ppornn.RNNArgs(num_steps=4, num_minibatches=2,
                              update_epochs=1, num_iterations=10,
                              rnn_hidden_dim=32)
    world = env.init_state(jax.random.PRNGKey(0))
    ts = cat_ppornn.init_train_state(jax.random.PRNGKey(1), env, args)
    obs = env.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    train = jax.jit(cat_ppornn.make_train_fn(env, args))
    for _ in range(2):
        ts, world, obs_n, stats = train(ts, world, obs_n)
    assert bool(jnp.isfinite(stats["loss"]))
    # hidden state carried and mostly nonzero
    assert float(jnp.abs(ts.ac_hidden).max()) > 0.0
