"""CleanRL-style PPO with Constraints-as-Terminations (Stack B learner).

Re-design of the reference's algos/PPO.py:14-330 as a single jitted train
iteration:

- RunningMeanStd observation + value normalizers (:20-62);
- separate actor-mean / critic MLPs [512, 256, 128] ELU with orthogonal
  init, state-independent learned log-std (:69-105);
- CaT float-done GAE: rewards *= (1 - done_prob), and the bootstrap factor
  is nextnonterminal (probabilistic) × true_nextnonterminal (hard dones)
  (:244-263) — the rl_games equivalent lives in utils/cat_common.py:11-115;
- linear LR anneal, clipped surrogate + clipped value loss on the
  value-normalized returns, minibatch epochs (:276-325).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@dataclass(frozen=True)
class CatPPOArgs:
    # cfg/train/Go2ParkourPPO.yaml via algos/PPO.py:152-165
    learning_rate: float = 3e-4
    num_steps: int = 24               # horizon_length
    num_iterations: int = 8000        # max_epochs
    gamma: float = 0.99
    gae_lambda: float = 0.95
    update_epochs: int = 5
    num_minibatches: int = 6          # minibatch_size 16384 of 24*4096
    clip_coef: float = 0.2
    ent_coef: float = 0.001
    vf_coef: float = 2.0
    max_grad_norm: float = 1.0
    norm_adv: bool = True
    clip_vloss: bool = True
    anneal_lr: bool = True
    std_floor: float = 0.0            # 0 = free logstd (reference-exact)
    hidden: tuple = (512, 256, 128)
    # Sharding-invariant mode (mirrors PPOArgs.sharding_invariant): action
    # noise from per-env RNG streams, env-strided minibatches reused across
    # epochs, and global-batch advantage moments — an n-device env-sharded
    # run computes the SAME training trajectory (params, CaT Polyak maxes,
    # RMS moments, terrain levels) as the single-device run
    # (tests/test_parallel.py::test_sharded_matches_unsharded_cat_ppo).
    # Default off = reference semantics (fresh permutation per epoch,
    # algos/PPO.py:276-285).
    sharding_invariant: bool = False


@struct.dataclass
class RMSState:
    """RunningMeanStd (algos/PPO.py:20-62)."""
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape=()):
        return cls(mean=jnp.zeros(shape), var=jnp.ones(shape),
                   count=jnp.ones(()))


def rms_update(s: RMSState, x: jnp.ndarray,
               axis_name: str | None = None) -> RMSState:
    bm = jnp.mean(x, axis=0)
    ex2 = jnp.mean(jnp.square(x), axis=0)
    bc = x.shape[0]
    if axis_name is not None:
        # cross-shard moments: every shard must apply the IDENTICAL update
        # or the replicated normalizer state diverges under shard_map
        bm = jax.lax.pmean(bm, axis_name)
        ex2 = jax.lax.pmean(ex2, axis_name)
        bc = bc * jax.lax.psum(1, axis_name)
    bv = ex2 - jnp.square(bm)
    delta = bm - s.mean
    tot = s.count + bc
    new_mean = s.mean + delta * bc / tot
    m2 = s.var * s.count + bv * bc + jnp.square(delta) * s.count * bc / tot
    return RMSState(mean=new_mean, var=m2 / tot, count=tot)


def rms_norm(s: RMSState, x: jnp.ndarray, eps=1e-8) -> jnp.ndarray:
    return (x - s.mean) / jnp.sqrt(s.var + eps)


def _orthogonal(key, shape, gain):
    w = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(w if shape[0] >= shape[1] else w.T)
    q = q * jnp.sign(jnp.diag(r))[None, :]
    if shape[0] < shape[1]:
        q = q.T
    return gain * q[:shape[0], :shape[1]]


def init_mlp(key, sizes, out_gain):
    """Orthogonal-init MLP params (layer_init, algos/PPO.py:64-67)."""
    params = []
    n = len(sizes) - 1
    for i in range(n):
        key, k = jax.random.split(key)
        gain = out_gain if i == n - 1 else jnp.sqrt(2.0)
        params.append({"w": _orthogonal(k, (sizes[i], sizes[i + 1]), gain),
                       "b": jnp.zeros(sizes[i + 1])})
    return params


def mlp_apply(params, x):
    for i, lyr in enumerate(params):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(params) - 1:
            x = jax.nn.elu(x)
    return x


def init_agent(key, num_obs, num_actions, args: CatPPOArgs):
    k1, k2, k3 = jax.random.split(key, 3)
    h = list(args.hidden)
    return {
        "critic": init_mlp(k1, [num_obs] + h + [1], 1.0),
        "actor_mean": init_mlp(k2, [num_obs] + h + [num_actions], 0.01),
        "actor_logstd": jnp.zeros(num_actions),
    }


def get_value(params, obs):
    return mlp_apply(params["critic"], obs)[..., 0]


def get_action_mean(params, obs):
    return mlp_apply(params["actor_mean"], obs)


def log_prob_entropy(params, obs, actions):
    mean = get_action_mean(params, obs)
    logstd = params["actor_logstd"]
    std = jnp.exp(logstd)
    logp = jnp.sum(
        -0.5 * jnp.square((actions - mean) / std)
        - logstd - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
    ent = jnp.sum(logstd + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
    return logp, jnp.broadcast_to(ent, logp.shape)


@struct.dataclass
class CatTrainState:
    params: Any
    opt_state: Any
    obs_rms: RMSState
    value_rms: RMSState
    key: jax.Array
    iteration: jnp.ndarray
    # carried across iterations (CleanRL keeps next_obs/next_done between
    # rollouts, algos/PPO.py:191-196)
    next_done: jnp.ndarray
    next_true_done: jnp.ndarray


def init_train_state(key, env, args: CatPPOArgs) -> CatTrainState:
    k1, k2 = jax.random.split(key)
    params = init_agent(k1, env.num_obs, env.num_actions, args)
    tx = make_optimizer(args)
    N = env.num_envs
    return CatTrainState(
        params=params, opt_state=tx.init(params),
        obs_rms=RMSState.create((env.num_obs,)),
        value_rms=RMSState.create(()),
        key=k2, iteration=jnp.int32(0),
        next_done=jnp.zeros(N), next_true_done=jnp.zeros(N))


def make_optimizer(args: CatPPOArgs):
    # LR applied manually (anneal is a traced scalar)
    return optax.chain(optax.clip_by_global_norm(args.max_grad_norm),
                       optax.scale_by_adam(eps=1e-5))


def cat_gae(rewards, dones, true_dones, values, next_value, next_done,
            next_true_done, gamma, lam):
    """Float-done GAE (algos/PPO.py:244-263): rewards *= (1 - dones) and the
    bootstrap carries nextnonterminal × true_nextnonterminal."""
    rewards = rewards * (1.0 - dones)
    T = rewards.shape[0]
    nd = jnp.concatenate([dones[1:], next_done[None]], axis=0)
    ntd = jnp.concatenate([true_dones[1:], next_true_done[None]], axis=0)
    nv = jnp.concatenate([values[1:], next_value[None]], axis=0)

    def body(lastgaelam, xs):
        rew, nd_t, ntd_t, nv_t, val = xs
        nonterm = (1.0 - nd_t) * (1.0 - ntd_t)
        delta = rew + gamma * nv_t * nonterm - val
        adv = delta + gamma * lam * nonterm * lastgaelam
        return adv, adv

    _, advs = jax.lax.scan(body, jnp.zeros_like(next_value),
                           (rewards, nd, ntd, nv, values), reverse=True)
    return advs, advs + values


def make_train_fn(env, args: CatPPOArgs, axis_name: str | None = None):
    """One jitted iteration: rollout num_steps, CaT-GAE, minibatch updates."""
    tx = make_optimizer(args)

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def train_iteration(ts: CatTrainState, world, obs_norm):
        """obs_norm: current normalized observation (N, num_obs). N comes
        from the data: under shard_map it is num_envs / n_devices."""
        N = obs_norm.shape[0]

        def rollout_step(carry, _):
            key, world, obs_norm, done, true_done, obs_rms = carry
            key, k_act = jax.random.split(key)
            mean = get_action_mean(ts.params, obs_norm)
            std = jnp.exp(ts.params["actor_logstd"])
            if args.sharding_invariant:
                # per-env noise streams: identical draws per env no matter
                # how the env axis is sharded (fold constant 977 is unused
                # by the env's own per-env streams, parkour_env.py:1009)
                noise = jax.vmap(lambda k: jax.random.normal(
                    jax.random.fold_in(k, 977), (mean.shape[-1],)))(
                    world.env.rng)
                actions = mean + std * noise
            else:
                actions = mean + std * jax.random.normal(k_act, mean.shape)
            logp, _ = log_prob_entropy(ts.params, obs_norm, actions)
            value = get_value(ts.params, obs_norm)
            world, next_obs, rew, done_prob, info = env.step(world, actions)
            obs_rms = rms_update(obs_rms, next_obs, axis_name)
            next_obs_norm = rms_norm(obs_rms, next_obs)
            tr = (obs_norm, actions, logp, rew, done, true_done, value)
            carry = (key, world, next_obs_norm, done_prob,
                     info["true_dones"].astype(jnp.float32), obs_rms)
            metrics = (info["terrain_level_mean"],
                       info["episode_sums_at_reset"], info["num_resets"],
                       info["episode_len_at_reset"],
                       info.get("crossings_by_type"),
                       info.get("dones_by_type"))
            return carry, (tr, metrics)

        key, k_roll = jax.random.split(ts.key)
        carry = (k_roll, world, obs_norm, ts.next_done, ts.next_true_done,
                 ts.obs_rms)
        carry, (traj, metrics) = jax.lax.scan(rollout_step, carry, None,
                                              length=args.num_steps)
        _, world, next_obs_norm, next_done, next_true_done, obs_rms = carry
        obs, actions, logps, rewards, dones, true_dones, values = traj

        next_value = get_value(ts.params, next_obs_norm)
        advs, returns = cat_gae(rewards, dones, true_dones, values,
                                next_value, next_done, next_true_done,
                                args.gamma, args.gae_lambda)

        B = args.num_steps * N
        flat = lambda x: x.reshape((B,) + x.shape[2:])
        b_obs, b_actions, b_logp = flat(obs), flat(actions), flat(logps)
        b_adv, b_ret, b_val = flat(advs), flat(returns), flat(values)

        # value normalization over the batch (algos/PPO.py:273-275)
        value_rms = rms_update(ts.value_rms, b_val, axis_name)
        value_rms = rms_update(value_rms, b_ret, axis_name)
        b_val_n = rms_norm(value_rms, b_val)
        b_ret_n = rms_norm(value_rms, b_ret)

        # LR anneal (:199-202)
        if args.anneal_lr:
            # clamp: resumed chunks can carry ts.iteration past
            # num_iterations; a negative frac would turn the update into
            # gradient ASCENT (set num_iterations to the total run length
            # via train_parkour.py --anneal-iterations for chunked runs)
            frac = jnp.clip(
                1.0 - ts.iteration.astype(jnp.float32) / args.num_iterations,
                0.0, 1.0)
            lr = frac * args.learning_rate
        else:
            lr = jnp.float32(args.learning_rate)

        def loss_fn(params, mb):
            o, a, old_logp, adv, ret_n, val_n = mb
            logp, ent = log_prob_entropy(params, o, a)
            ratio = jnp.exp(logp - old_logp)
            if args.norm_adv:
                # global-batch moments: every shard holds an equal share of
                # each minibatch, so pmean'd mean/var == the unsharded
                # minibatch moments (identity when unsharded)
                m = _pmean(adv.mean())
                v = _pmean(jnp.mean(jnp.square(adv - m)))
                adv = (adv - m) / (jnp.sqrt(v) + 1e-8)
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1 - args.clip_coef, 1 + args.clip_coef)
            pg_loss = jnp.maximum(pg1, pg2).mean()
            newv = rms_norm(value_rms, get_value(params, o))
            if args.clip_vloss:
                v_unc = jnp.square(newv - ret_n)
                v_cl = jnp.square(val_n + jnp.clip(newv - val_n,
                                                   -args.clip_coef,
                                                   args.clip_coef) - ret_n)
                v_loss = 0.5 * jnp.maximum(v_unc, v_cl).mean()
            else:
                v_loss = 0.5 * jnp.square(newv - ret_n).mean()
            loss = pg_loss - args.ent_coef * ent.mean() + args.vf_coef * v_loss
            return loss, (pg_loss, v_loss)

        mb_size = B // args.num_minibatches
        key, k_perm = jax.random.split(key)

        if args.sharding_invariant:
            # env-strided minibatches (env n -> minibatch n % M): every
            # shard contributes an equal share to each minibatch, so pmean'd
            # gradients equal the unsharded global-batch gradients
            import numpy as _np
            M = args.num_minibatches
            assert N % M == 0, "env count per shard must divide minibatches"
            base = _np.arange(B).reshape(args.num_steps, N)
            inv_idxs = jnp.stack(
                [jnp.asarray(base[:, mth::M].reshape(-1)) for mth in range(M)])

        def epoch_step(carry, k_ep):
            params, opt_state = carry
            perm = jax.random.permutation(k_ep, B)

            def mb_step(carry2, idx):
                params, opt_state = carry2
                mb = (b_obs[idx], b_actions[idx], b_logp[idx], b_adv[idx],
                      b_ret_n[idx], b_val_n[idx])
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                grads = jax.tree.map(_pmean, grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
                if args.std_floor > 0.0:
                    # exploration floor: project the logstd parameter up
                    # after each update. Off (0.0) = reference-exact free
                    # logstd; the parkour discovery runs use 0.3 — the CaT
                    # death gradient collapses std to ~0.2 within 1.5k
                    # iterations, long before a first obstacle traversal is
                    # ever sampled (BASELINE.md round-5 adjudication).
                    params = dict(params, actor_logstd=jnp.maximum(
                        params["actor_logstd"],
                        jnp.log(jnp.float32(args.std_floor))))
                return (params, opt_state), (loss,) + aux

            if args.sharding_invariant:
                idxs = inv_idxs
            else:
                idxs = perm[:mb_size * args.num_minibatches].reshape(
                    args.num_minibatches, mb_size)
            (params, opt_state), aux = jax.lax.scan(
                mb_step, (params, opt_state), idxs)
            return (params, opt_state), aux

        k_eps = jax.random.split(k_perm, args.update_epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state), k_eps)
        loss, pg_loss, v_loss = jax.tree.map(jnp.mean, aux)

        terrain_lvl, ep_sums, n_resets, ep_len, cross_t, dones_t = metrics
        def _psum(x):
            return jax.lax.psum(x, axis_name) if axis_name is not None else x

        total_resets = jnp.maximum(_psum(jnp.sum(n_resets)), 1)
        ts = ts.replace(params=params, opt_state=opt_state, obs_rms=obs_rms,
                        value_rms=value_rms, key=key,
                        iteration=ts.iteration + 1,
                        next_done=next_done, next_true_done=next_true_done)
        stats = {
            "loss": _pmean(loss), "pg_loss": _pmean(pg_loss),
            "value_loss": _pmean(v_loss),
            "mean_step_reward": _pmean(jnp.mean(rewards)),
            "terrain_level_mean": _pmean(terrain_lvl[-1]),
            "episode_sums": _psum(jnp.sum(ep_sums, axis=0)) / total_resets,
            "mean_episode_length": (_psum(jnp.sum(ep_len))
                                    / total_resets * env.dt),
            "num_episodes": _psum(jnp.sum(n_resets)),
            "lr": lr,
        }
        if cross_t is not None:
            # per-track-type promotion stats (crossings / dones per terrain
            # type column, summed over the rollout) — the monitor maps
            # columns to track kinds for per-kind crossing rates
            stats["crossings_by_type"] = _psum(jnp.sum(cross_t, axis=0))
            stats["dones_by_type"] = _psum(jnp.sum(dones_t, axis=0))
        return ts, world, next_obs_norm, stats

    return train_iteration
