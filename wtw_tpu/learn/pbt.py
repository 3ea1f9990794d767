"""Population-based training.

The reference only carries a disabled PBT hook (cfg/pbt/no_pbt.yaml
`enabled: False`, initial_pbt_check at newtrain.py:55-56). Here PBT is
actually implemented the TPU way: the population is a LEADING AXIS — the
whole population trains in one vmapped jitted call (each member with its
own env shard, params, and learning rate), and exploit/explore is a pure
function on the stacked state (bottom performers copy top performers'
params and perturb their learning rate).

Works with ppo_cse (whose TrainState carries `lr` as a traced scalar).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import ppo_cse


@dataclass(frozen=True)
class PBTArgs:
    population: int = 4
    exploit_interval: int = 50        # iterations between exploit/explore
    exploit_frac: float = 0.25        # bottom quantile replaced
    lr_perturb: tuple = (0.8, 1.25)


def init_population(key, env, ppo_args: ppo_cse.PPOArgs, pbt: PBTArgs):
    """Stacked (population-leading) TrainState/World/obs. Each member gets
    its own RNG stream and an lr log-spaced around the base value."""
    keys = jax.random.split(key, pbt.population)

    def init_one(k, i):
        k_env, k_train = jax.random.split(k)
        world = env.init_state(k_env)
        world, obs = env.get_observations(world)
        ts = ppo_cse.init_train_state(k_train, env, ppo_args)
        lr = ppo_args.learning_rate * (2.0 ** (i - pbt.population / 2))
        return ts.replace(lr=jnp.float32(lr)), world, obs

    return jax.vmap(init_one)(keys, jnp.arange(pbt.population, dtype=jnp.float32))


def make_pbt_train_fn(env, ppo_args: ppo_cse.PPOArgs):
    base = ppo_cse.make_train_fns(env, ppo_args)

    def train(ts, world, obs):
        return jax.vmap(base)(ts, world, obs)

    return train


def exploit_explore(key, ts, fitness, pbt: PBTArgs):
    """Truncation PBT (pure function on stacked TrainState): members in the
    bottom exploit_frac copy a uniformly-chosen top-frac member's params,
    optimizer state, and lr (perturbed)."""
    P = fitness.shape[0]
    n_cut = max(1, int(P * pbt.exploit_frac))
    order = jnp.argsort(fitness)               # ascending
    bottom = order[:n_cut]
    top = order[P - n_cut:]
    k1, k2 = jax.random.split(key)
    src = top[jax.random.randint(k1, (n_cut,), 0, n_cut)]

    is_bottom = jnp.zeros((P,), bool).at[bottom].set(True)
    # source index per member: itself unless bottom
    src_full = jnp.arange(P).at[bottom].set(src)

    def gather(x):
        return x[src_full]

    new_ts = jax.tree.map(gather, ts)
    perturb = jnp.exp(jax.random.uniform(
        k2, (P,), minval=jnp.log(pbt.lr_perturb[0]),
        maxval=jnp.log(pbt.lr_perturb[1])))
    new_lr = jnp.where(is_bottom, new_ts.lr * perturb, ts.lr)
    # non-bottom members keep everything of their own
    keep = lambda new, old: jnp.where(
        is_bottom.reshape((P,) + (1,) * (old.ndim - 1)), new, old)
    ts = jax.tree.map(keep, new_ts, ts)
    return ts.replace(lr=new_lr)


def train_pbt(env, ppo_args, pbt: PBTArgs, iterations: int, seed: int = 0,
              log_fn=print, log_freq: int = 10):
    """Host driver: vmapped population training with periodic
    exploit/explore on mean step reward."""
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    ts, world, obs = init_population(k_init, env, ppo_args, pbt)
    train = jax.jit(make_pbt_train_fn(env, ppo_args))
    fitness = jnp.zeros(pbt.population)
    for it in range(iterations):
        ts, world, obs, stats = train(ts, world, obs)
        fitness = 0.9 * fitness + 0.1 * stats["mean_step_reward"]
        if (it + 1) % pbt.exploit_interval == 0:
            key, k_ex = jax.random.split(key)
            ts = exploit_explore(k_ex, ts, fitness, pbt)
        if it % log_freq == 0:
            log_fn(f"pbt it {it:5d} | fitness "
                   + " ".join(f"{float(f):.4f}" for f in fitness)
                   + " | lr " + " ".join(f"{float(l):.1e}" for l in ts.lr))
    return ts, fitness
