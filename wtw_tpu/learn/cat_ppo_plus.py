"""PPO+ — PPO with a learned Q(s, a) head and gradient-free action
improvement (Stack B).

Re-design of the reference's algos/PPO_plus.py:69-410:

- extra Q-network over [obs, action] ([512, 256, 128] ELU, :94-103);
- during the rollout, each sampled action is refined by
  `num_improvement_steps` rounds of smoothed zeroth-order ascent on Q:
  a += alpha / (N sigma) * sum_i Q(s, a + eps_i) * eps_i with
  eps_i ~ N(0, sigma^2) (:237-265); the log-prob is then recomputed for the
  improved action under the current policy (:266);
- Q trained on the (value-normalized) returns alongside the clipped value
  loss (:374-378).

Everything else (CaT float-done GAE, normalizers, minibatch epochs) is the
cat_ppo machinery.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .cat_ppo import (CatPPOArgs, RMSState, cat_gae, get_action_mean,
                      get_value, init_agent, init_mlp, log_prob_entropy,
                      make_optimizer, mlp_apply, rms_norm, rms_update)


@dataclass(frozen=True)
class PPOPlusArgs(CatPPOArgs):
    # action-improvement hyperparameters (algos/PPO_plus.py:186-191)
    n_perturbations: int = 10
    sigma: float = 0.1
    alpha: float = 0.1
    num_improvement_steps: int = 1


def init_plus_agent(key, num_obs, num_actions, args: PPOPlusArgs):
    k1, k2 = jax.random.split(key)
    params = init_agent(k1, num_obs, num_actions, args)
    params["q_net"] = init_mlp(
        k2, [num_obs + num_actions] + list(args.hidden) + [1], 1.0)
    return params


def q_value(params, obs, actions):
    x = jnp.concatenate([obs, actions], axis=-1)
    return mlp_apply(params["q_net"], x)[..., 0]


def improve_actions(params, key, obs, actions, args: PPOPlusArgs):
    """Zeroth-order action refinement on Q (algos/PPO_plus.py:237-265)."""
    Np = args.n_perturbations

    def one_round(a, k):
        noise = args.sigma * jax.random.normal(
            k, (Np,) + a.shape)                       # (Np, N, act)
        perturbed = a[None] + noise
        q = jax.vmap(lambda p_act: q_value(params, obs, p_act))(perturbed)
        delta = (args.alpha / (Np * args.sigma)
                 * jnp.einsum("pn,pna->na", q, noise))
        return a + delta, None

    keys = jax.random.split(key, args.num_improvement_steps)
    a, _ = jax.lax.scan(one_round, actions, keys)
    return a


@struct.dataclass
class PlusTrainState:
    params: Any
    opt_state: Any
    obs_rms: RMSState
    value_rms: RMSState
    key: jax.Array
    iteration: jnp.ndarray
    next_done: jnp.ndarray
    next_true_done: jnp.ndarray


def init_train_state(key, env, args: PPOPlusArgs) -> PlusTrainState:
    k1, k2 = jax.random.split(key)
    params = init_plus_agent(k1, env.num_obs, env.num_actions, args)
    tx = make_optimizer(args)
    N = env.num_envs
    return PlusTrainState(
        params=params, opt_state=tx.init(params),
        obs_rms=RMSState.create((env.num_obs,)),
        value_rms=RMSState.create(()), key=k2, iteration=jnp.int32(0),
        next_done=jnp.zeros(N), next_true_done=jnp.zeros(N))


def make_train_fn(env, args: PPOPlusArgs, axis_name: str | None = None):
    tx = make_optimizer(args)

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def train_iteration(ts: PlusTrainState, world, obs_norm):
        N = env.num_envs

        def rollout_step(carry, _):
            key, world, obs_n, done, true_done, obs_rms = carry
            key, k_act, k_imp = jax.random.split(key, 3)
            mean = get_action_mean(ts.params, obs_n)
            std = jnp.exp(ts.params["actor_logstd"])
            actions = mean + std * jax.random.normal(k_act, mean.shape)
            actions = improve_actions(ts.params, k_imp, obs_n, actions, args)
            logp, _ = log_prob_entropy(ts.params, obs_n, actions)
            value = get_value(ts.params, obs_n)
            world, next_obs, rew, done_prob, info = env.step(world, actions)
            obs_rms = rms_update(obs_rms, next_obs)
            tr = (obs_n, actions, logp, rew, done, true_done, value)
            carry = (key, world, rms_norm(obs_rms, next_obs), done_prob,
                     info["true_dones"].astype(jnp.float32), obs_rms)
            return carry, tr

        key, k_roll = jax.random.split(ts.key)
        carry = (k_roll, world, obs_norm, ts.next_done, ts.next_true_done,
                 ts.obs_rms)
        carry, traj = jax.lax.scan(rollout_step, carry, None,
                                   length=args.num_steps)
        _, world, next_obs_norm, next_done, next_true_done, obs_rms = carry
        obs, actions, logps, rewards, dones, true_dones, values = traj

        next_value = get_value(ts.params, next_obs_norm)
        advs, returns = cat_gae(rewards, dones, true_dones, values,
                                next_value, next_done, next_true_done,
                                args.gamma, args.gae_lambda)

        B = args.num_steps * N
        flat = lambda x: x.reshape((B,) + x.shape[2:])
        b_obs, b_act, b_logp = flat(obs), flat(actions), flat(logps)
        b_adv, b_ret, b_val = flat(advs), flat(returns), flat(values)
        value_rms = rms_update(ts.value_rms, b_val)
        value_rms = rms_update(value_rms, b_ret)
        b_val_n = rms_norm(value_rms, b_val)
        b_ret_n = rms_norm(value_rms, b_ret)

        if args.anneal_lr:
            # clamped like cat_ppo: never let a resumed chunk go negative
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
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
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
            q = q_value(params, o, a)
            q_loss = 0.5 * jnp.square(q - ret_n).mean()   # :374-375
            loss = (pg_loss - args.ent_coef * ent.mean()
                    + args.vf_coef * (v_loss + q_loss))
            return loss, (pg_loss, v_loss, q_loss)

        mb_size = B // args.num_minibatches
        key, k_perm = jax.random.split(key)

        def epoch_step(carry, k_ep):
            params, opt_state = carry
            perm = jax.random.permutation(k_ep, B)

            def mb_step(carry2, idx):
                params, opt_state = carry2
                mb = (b_obs[idx], b_act[idx], b_logp[idx], b_adv[idx],
                      b_ret_n[idx], b_val_n[idx])
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                grads = jax.tree.map(_pmean, grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
                return (params, opt_state), (loss,) + aux

            idxs = perm[:mb_size * args.num_minibatches].reshape(
                args.num_minibatches, mb_size)
            (params, opt_state), aux = jax.lax.scan(mb_step,
                                                    (params, opt_state), idxs)
            return (params, opt_state), aux

        k_eps = jax.random.split(k_perm, args.update_epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state), k_eps)
        loss, pg_loss, v_loss, q_loss = jax.tree.map(jnp.mean, aux)

        ts = ts.replace(params=params, opt_state=opt_state, obs_rms=obs_rms,
                        value_rms=value_rms, key=key,
                        iteration=ts.iteration + 1, next_done=next_done,
                        next_true_done=next_true_done)
        stats = {"loss": _pmean(loss), "pg_loss": _pmean(pg_loss),
                 "value_loss": _pmean(v_loss), "q_loss": _pmean(q_loss),
                 "mean_step_reward": _pmean(jnp.mean(rewards)), "lr": lr}
        return ts, world, next_obs_norm, stats

    return train_iteration
