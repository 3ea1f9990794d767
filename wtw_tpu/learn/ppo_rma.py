"""RMA-style PPO (teacher/student with an env-factor encoder).

Re-design of go1_gym_learn/ppo/ (the reference's second Stack-A learner,
~936 LoC) as one jitted train iteration. Differences vs ppo_cse
(SURVEY.md §2.2 'ppo/ (RMA variant)'):

- env_factor_encoder: privileged obs (18) -> latent (18), hidden [256, 128]
  (ppo/actor_critic.py:17-20, 38-56);
- adaptation module: obs_history -> latent (hidden [256, 32]), trained by
  MSE onto the ENCODER's latent (not the raw privileged obs), target
  stop-gradiented (ppo/ppo.py:156-164);
- actor/critic consume [current obs, latent] (not obs_history;
  actor_critic.py:137-141);
- training acts with the TEACHER latent encoder(priv) (:142-144).

Deployment uses act_student: adaptation(obs_history) in place of the
encoder.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.actor_critic import (_apply_mlp, _init_mlp, entropy, log_prob,
                                   sample_actions)
from .ppo_cse import PPOArgs, compute_gae, make_optimizers


@dataclass(frozen=True)
class RMAArgs:
    # ppo/actor_critic.py:9-20
    init_noise_std: float = 1.0
    actor_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    critic_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    encoder_hidden_dims: Tuple[int, ...] = (256, 128)
    adaptation_hidden_dims: Tuple[int, ...] = (256, 32)
    latent_dim: int = 18
    activation: str = "elu"


def init_rma(key, num_obs, num_privileged_obs, num_obs_history, num_actions,
             args: RMAArgs = RMAArgs()) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = args.latent_dim
    return {
        "encoder": _init_mlp(
            k1, (num_privileged_obs,) + args.encoder_hidden_dims + (d,)),
        "adaptation": _init_mlp(
            k2, (num_obs_history,) + args.adaptation_hidden_dims + (d,)),
        "actor": _init_mlp(
            k3, (num_obs + d,) + args.actor_hidden_dims + (num_actions,)),
        "critic": _init_mlp(
            k4, (num_obs + d,) + args.critic_hidden_dims + (1,)),
        "std": args.init_noise_std * jnp.ones(num_actions),
    }


def encode(params, privileged_obs, args: RMAArgs = RMAArgs()):
    return _apply_mlp(params["encoder"], privileged_obs, args.activation)


def adapt(params, obs_history, args: RMAArgs = RMAArgs()):
    return _apply_mlp(params["adaptation"], obs_history, args.activation)


def actor_mean(params, obs, latent, args: RMAArgs = RMAArgs()):
    x = jnp.concatenate([obs, latent], axis=-1)
    return _apply_mlp(params["actor"], x, args.activation)


def evaluate(params, obs, latent, args: RMAArgs = RMAArgs()):
    x = jnp.concatenate([obs, latent], axis=-1)
    return _apply_mlp(params["critic"], x, args.activation)[..., 0]


def act_teacher(params, obs, privileged_obs, args: RMAArgs = RMAArgs()):
    return actor_mean(params, obs, encode(params, privileged_obs, args), args)


def act_student(params, obs, obs_history, args: RMAArgs = RMAArgs()):
    """Deployment path: latent from the adaptation module."""
    latent = adapt(params, obs_history, args)
    return actor_mean(params, obs, latent, args), latent


@struct.dataclass
class RMATrainState:
    params: Any
    opt_state: Any
    adapt_opt_state: Any
    lr: jnp.ndarray
    key: jax.Array
    iteration: jnp.ndarray


def init_train_state(key, env, args: PPOArgs = PPOArgs(),
                     rma: RMAArgs = RMAArgs()) -> RMATrainState:
    k1, k2 = jax.random.split(key)
    params = init_rma(k1, env.num_obs, env.num_privileged_obs,
                      env.num_obs_history, env.num_actions, rma)
    tx, adapt_tx = make_optimizers(args)
    return RMATrainState(params=params, opt_state=tx.init(params),
                         adapt_opt_state=adapt_tx.init(params),
                         lr=jnp.float32(args.learning_rate), key=k2,
                         iteration=jnp.int32(0))


def make_train_fn(env, args: PPOArgs = PPOArgs(), rma: RMAArgs = RMAArgs(),
                  axis_name: str | None = None):
    tx, adapt_tx = make_optimizers(args)

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def rollout(ts, world, obs_dict):
        def step_fn(carry, _):
            key, world, obs_dict = carry
            key, k_act = jax.random.split(key)
            obs, priv = obs_dict["obs"], obs_dict["privileged_obs"]
            latent = encode(ts.params, priv, rma)
            mean = actor_mean(ts.params, obs, latent, rma)
            std = jnp.broadcast_to(ts.params["std"], mean.shape)
            actions = sample_actions(k_act, mean, std)
            logp = log_prob(mean, std, actions)
            values = evaluate(ts.params, obs, latent, rma)
            world, next_obs, rew, done, info = env.step(world, actions)
            rew_b = rew + args.gamma * values * info["time_outs"]
            tr = (obs, priv, obs_dict["obs_history"], actions, rew_b,
                  done.astype(jnp.float32), values, logp, mean, std)
            return (key, world, next_obs), (tr, rew)

        key, k_roll = jax.random.split(ts.key)
        (k_roll, world, obs_dict), (traj, rews) = jax.lax.scan(
            step_fn, (k_roll, world, obs_dict), None,
            length=args.num_steps_per_env)
        return ts.replace(key=key), world, obs_dict, traj, rews

    def ppo_loss(params, batch):
        obs, priv, actions, old_logp, old_mu, old_sigma, target_v, adv, ret = batch
        latent = encode(params, priv, rma)
        mean = actor_mean(params, obs, latent, rma)
        std = jnp.broadcast_to(params["std"], mean.shape)
        logp = log_prob(mean, std, actions)
        value = evaluate(params, obs, latent, rma)
        ent = entropy(std)

        ratio = jnp.exp(logp - old_logp)
        surr = -adv * ratio
        surr_c = -adv * jnp.clip(ratio, 1 - args.clip_param, 1 + args.clip_param)
        surrogate = jnp.maximum(surr, surr_c).mean()
        v_clipped = target_v + jnp.clip(value - target_v, -args.clip_param,
                                        args.clip_param)
        v_loss = jnp.maximum((value - ret) ** 2, (v_clipped - ret) ** 2).mean()
        loss = (surrogate + args.value_loss_coef * v_loss
                - args.entropy_coef * ent.mean())
        kl = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (old_sigma ** 2 + (old_mu - mean) ** 2) / (2 * std ** 2) - 0.5,
            axis=-1).mean()
        return loss, (surrogate, v_loss, kl)

    def adaptation_loss_fn(params, obs_h, priv):
        pred = adapt(params, obs_h, rma)
        target = jax.lax.stop_gradient(encode(params, priv, rma))  # :158-160
        return jnp.mean((pred - target) ** 2)

    def update(ts, traj, last_obs_dict):
        obs, priv, obs_h, actions, rewards, dones, values, logps, mus, sigmas = traj
        T, N = rewards.shape
        last_latent = encode(ts.params, last_obs_dict["privileged_obs"], rma)
        last_values = evaluate(ts.params, last_obs_dict["obs"], last_latent,
                               rma)
        advs, returns = compute_gae(rewards, dones, values, last_values,
                                    args.gamma, args.lam)
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        data = (flat(obs), flat(priv), flat(actions), flat(logps), flat(mus),
                flat(sigmas), flat(values), flat(advs), flat(returns))
        obs_h_flat = flat(obs_h)

        key, k_perm = jax.random.split(ts.key)
        perm = jax.random.permutation(k_perm, T * N)
        mb_size = T * N // args.num_mini_batches

        def minibatch_step(carry, idx):
            params, opt_state, adapt_opt_state, lr = carry
            batch = tuple(d[idx] for d in data)
            (loss, (surr, v_loss, kl)), grads = jax.value_and_grad(
                ppo_loss, has_aux=True)(params, batch)
            grads = jax.tree.map(_pmean, grads)
            kl = _pmean(kl)
            if args.desired_kl is not None and args.schedule == "adaptive":
                lr = jnp.where(kl > args.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl < args.desired_kl / 2.0) & (kl > 0.0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)

            a_loss = jnp.float32(0.0)
            for _ in range(args.num_adaptation_module_substeps):
                a_loss, a_grads = jax.value_and_grad(adaptation_loss_fn)(
                    params, obs_h_flat[idx], batch[1])
                a_grads = jax.tree.map(_pmean, a_grads)
                a_up, adapt_opt_state = adapt_tx.update(
                    a_grads, adapt_opt_state, params)
                params = optax.apply_updates(params, a_up)
            return (params, opt_state, adapt_opt_state, lr), (
                loss, surr, v_loss, kl, a_loss)

        idxs = jnp.stack([perm[i * mb_size:(i + 1) * mb_size]
                          for i in range(args.num_mini_batches)])
        idxs = jnp.tile(idxs, (args.num_learning_epochs, 1))
        (params, opt_state, adapt_opt_state, lr), aux = jax.lax.scan(
            minibatch_step, (ts.params, ts.opt_state, ts.adapt_opt_state,
                             ts.lr), idxs)
        loss, surr, v_loss, kl, a_loss = jax.tree.map(jnp.mean, aux)
        ts = ts.replace(params=params, opt_state=opt_state,
                        adapt_opt_state=adapt_opt_state, lr=lr, key=key,
                        iteration=ts.iteration + 1)
        return ts, {"loss": loss, "surrogate_loss": surr,
                    "value_loss": v_loss, "kl_mean": kl,
                    "adaptation_loss": a_loss, "lr": lr}

    def train_iteration(ts, world, obs_dict):
        ts, world, obs_dict, traj, rews = rollout(ts, world, obs_dict)
        ts, stats = update(ts, traj, obs_dict)
        stats = {k: _pmean(v) for k, v in stats.items()}
        stats["mean_step_reward"] = _pmean(jnp.mean(rews))
        return ts, world, obs_dict, stats

    return train_iteration
