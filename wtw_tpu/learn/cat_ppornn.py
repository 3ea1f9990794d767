"""Recurrent PPO with CaT (GRU actor & critic memories).

Re-design of the reference's algos/PPORNN.py:69-337:

- per-net GRU memory (hidden 256) whose output is concatenated with the raw
  observation before the [512, 256, 128] ELU heads (:72-95);
- hidden state carried across iterations, zeroed on HARD dones during the
  rollout (:207-210);
- minibatches are whole ENV TRAJECTORIES: the update re-runs the GRU over
  each env's T-step sequence from the iteration-start hidden (:246-266);
- same CaT float-done GAE and value/obs normalizers as cat_ppo.

The GRU is a hand-rolled cell with torch gating conventions so weights
trained here export 1:1 to torch deployments.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .cat_ppo import (CatPPOArgs, RMSState, cat_gae, init_mlp, mlp_apply,
                      make_optimizer, rms_norm, rms_update)


@dataclass(frozen=True)
class RNNArgs(CatPPOArgs):
    rnn_hidden_dim: int = 256     # RNN_LATENT_DIM (algos/PPORNN.py:140)


def init_gru(key, in_dim, hidden):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound,
                                            maxval=bound)
    kw = jax.random.split(k1, 2)
    kb = jax.random.split(k2, 2)
    return {
        "w_ih": u(kw[0], (in_dim, 3 * hidden)),
        "w_hh": u(kw[1], (hidden, 3 * hidden)),
        "b_ih": u(kb[0], (3 * hidden,)),
        "b_hh": u(kb[1], (3 * hidden,)),
    }


def gru_cell(p, x, h):
    """One torch-convention GRU step. x: (..., in), h: (..., hidden)."""
    H = h.shape[-1]
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def init_agent(key, num_obs, num_actions, args: RNNArgs):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = list(args.hidden)
    d = args.rnn_hidden_dim
    return {
        "actor_memory": init_gru(k1, num_obs, d),
        "critic_memory": init_gru(k2, num_obs, d),
        "critic": init_mlp(k3, [num_obs + d] + h + [1], 1.0),
        "actor_mean": init_mlp(k4, [num_obs + d] + h + [num_actions], 0.01),
        "actor_logstd": jnp.zeros(num_actions),
    }


def forward(params, obs, ac_h, cr_h):
    """One step: returns (mean, value, ac_h', cr_h')."""
    ac_out = gru_cell(params["actor_memory"], obs, ac_h)
    cr_out = gru_cell(params["critic_memory"], obs, cr_h)
    mean = mlp_apply(params["actor_mean"],
                     jnp.concatenate([ac_out, obs], axis=-1))
    value = mlp_apply(params["critic"],
                      jnp.concatenate([cr_out, obs], axis=-1))[..., 0]
    return mean, value, ac_out, cr_out


def _log_prob(mean, logstd, actions):
    std = jnp.exp(logstd)
    return jnp.sum(-0.5 * jnp.square((actions - mean) / std) - logstd
                   - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


@struct.dataclass
class RNNTrainState:
    params: Any
    opt_state: Any
    obs_rms: RMSState
    value_rms: RMSState
    key: jax.Array
    iteration: jnp.ndarray
    next_done: jnp.ndarray
    next_true_done: jnp.ndarray
    ac_hidden: jnp.ndarray     # (N, d)
    cr_hidden: jnp.ndarray


def init_train_state(key, env, args: RNNArgs) -> RNNTrainState:
    k1, k2 = jax.random.split(key)
    params = init_agent(k1, env.num_obs, env.num_actions, args)
    tx = make_optimizer(args)
    N, d = env.num_envs, args.rnn_hidden_dim
    return RNNTrainState(
        params=params, opt_state=tx.init(params),
        obs_rms=RMSState.create((env.num_obs,)),
        value_rms=RMSState.create(()), key=k2, iteration=jnp.int32(0),
        next_done=jnp.zeros(N), next_true_done=jnp.zeros(N),
        ac_hidden=jnp.zeros((N, d)), cr_hidden=jnp.zeros((N, d)))


def make_train_fn(env, args: RNNArgs, axis_name: str | None = None):
    tx = make_optimizer(args)

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def train_iteration(ts: RNNTrainState, world, obs_norm):
        N = env.num_envs
        h0_ac, h0_cr = ts.ac_hidden, ts.cr_hidden   # iteration-start hiddens

        def rollout_step(carry, _):
            key, world, obs_n, done, true_done, obs_rms, ac_h, cr_h = carry
            key, k_act = jax.random.split(key)
            mean, value, ac_h2, cr_h2 = forward(ts.params, obs_n, ac_h, cr_h)
            std = jnp.exp(ts.params["actor_logstd"])
            actions = mean + std * jax.random.normal(k_act, mean.shape)
            logp = _log_prob(mean, ts.params["actor_logstd"], actions)
            world, next_obs, rew, done_prob, info = env.step(world, actions)
            obs_rms = rms_update(obs_rms, next_obs)
            next_obs_n = rms_norm(obs_rms, next_obs)
            td = info["true_dones"].astype(jnp.float32)
            # zero memories on hard dones (:207-210)
            ac_h2 = ac_h2 * (1.0 - td)[:, None]
            cr_h2 = cr_h2 * (1.0 - td)[:, None]
            tr = (obs_n, actions, logp, rew, done, true_done, value)
            return ((key, world, next_obs_n, done_prob, td, obs_rms,
                     ac_h2, cr_h2), tr)

        key, k_roll = jax.random.split(ts.key)
        carry = (k_roll, world, obs_norm, ts.next_done, ts.next_true_done,
                 ts.obs_rms, h0_ac, h0_cr)
        carry, traj = jax.lax.scan(rollout_step, carry, None,
                                   length=args.num_steps)
        (_, world, next_obs_n, next_done, next_true_done, obs_rms,
         ac_hN, cr_hN) = carry
        obs, actions, logps, rewards, dones, true_dones, values = traj

        _, next_value, _, _ = forward(ts.params, next_obs_n, ac_hN, cr_hN)
        advs, returns = cat_gae(rewards, dones, true_dones, values,
                                next_value, next_done, next_true_done,
                                args.gamma, args.gae_lambda)

        # env-major sequences (swapaxes :246-251)
        seq = lambda x: jnp.swapaxes(x, 0, 1)   # (N, T, ...)
        b_obs, b_act, b_logp = seq(obs), seq(actions), seq(logps)
        b_adv, b_ret, b_val = seq(advs), seq(returns), seq(values)
        b_td = seq(true_dones)

        value_rms = rms_update(ts.value_rms, b_val.reshape(-1))
        value_rms = rms_update(value_rms, b_ret.reshape(-1))
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

        def seq_forward(params, o_seq, h_ac0, h_cr0, td_seq):
            """Re-run both GRUs over a (B, T, obs) sequence, zeroing hiddens
            after hard dones like the rollout did."""
            def step(h, xs):
                o_t, td_t = xs
                mean, value, h_ac, h_cr = forward(params, o_t, h[0], h[1])
                h_ac = h_ac * (1.0 - td_t)[:, None]
                h_cr = h_cr * (1.0 - td_t)[:, None]
                return (h_ac, h_cr), (mean, value)

            o_tm = jnp.swapaxes(o_seq, 0, 1)       # (T, B, obs)
            td_tm = jnp.swapaxes(td_seq, 0, 1)
            _, (means, vals) = jax.lax.scan(step, (h_ac0, h_cr0),
                                            (o_tm, td_tm))
            return jnp.swapaxes(means, 0, 1), jnp.swapaxes(vals, 0, 1)

        def loss_fn(params, mb):
            o, a, old_logp, adv, ret_n, val_n, h_ac0, h_cr0, td = mb
            means, vals = seq_forward(params, o, h_ac0, h_cr0, td)
            logp = _log_prob(means, params["actor_logstd"], a)
            ratio = jnp.exp(logp - old_logp)
            if args.norm_adv:
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1 - args.clip_coef, 1 + args.clip_coef)
            pg_loss = jnp.maximum(pg1, pg2).mean()
            newv = rms_norm(value_rms, vals)
            if args.clip_vloss:
                v_unc = jnp.square(newv - ret_n)
                v_cl = jnp.square(val_n + jnp.clip(newv - val_n,
                                                   -args.clip_coef,
                                                   args.clip_coef) - ret_n)
                v_loss = 0.5 * jnp.maximum(v_unc, v_cl).mean()
            else:
                v_loss = 0.5 * jnp.square(newv - ret_n).mean()
            ent = jnp.sum(params["actor_logstd"]
                          + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            loss = pg_loss - args.ent_coef * ent + args.vf_coef * v_loss
            return loss, (pg_loss, v_loss)

        mb_envs = max(N // args.num_minibatches, 1)
        key, k_perm = jax.random.split(key)

        def epoch_step(carry, k_ep):
            params, opt_state = carry
            perm = jax.random.permutation(k_ep, N)

            def mb_step(carry2, idx):
                params, opt_state = carry2
                mb = (b_obs[idx], b_act[idx], b_logp[idx], b_adv[idx],
                      b_ret_n[idx], b_val_n[idx], h0_ac[idx], h0_cr[idx],
                      b_td[idx])
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                grads = jax.tree.map(_pmean, grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
                return (params, opt_state), (loss,) + aux

            idxs = perm[:mb_envs * args.num_minibatches].reshape(
                args.num_minibatches, mb_envs)
            (params, opt_state), aux = jax.lax.scan(mb_step,
                                                    (params, opt_state), idxs)
            return (params, opt_state), aux

        k_eps = jax.random.split(k_perm, args.update_epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state), k_eps)
        loss, pg_loss, v_loss = jax.tree.map(jnp.mean, aux)

        ts = ts.replace(params=params, opt_state=opt_state, obs_rms=obs_rms,
                        value_rms=value_rms, key=key,
                        iteration=ts.iteration + 1, next_done=next_done,
                        next_true_done=next_true_done,
                        ac_hidden=ac_hN, cr_hidden=cr_hN)
        stats = {"loss": _pmean(loss), "pg_loss": _pmean(pg_loss),
                 "value_loss": _pmean(v_loss),
                 "mean_step_reward": _pmean(jnp.mean(rewards)), "lr": lr}
        return ts, world, next_obs_n, stats

    return train_iteration
