"""PPO with concurrent state estimation (the WTW flagship learner).

Re-design of go1_gym_learn/ppo_cse/{ppo.py, rollout_storage.py} as a single
jitted train iteration: 24-step on-device rollout (lax.scan over env.step),
GAE, then 5 epochs × 4 minibatches of clipped-surrogate PPO with adaptive-KL
learning rate and the supervised adaptation-module regression substep —
no host round-trips inside an iteration.

Hyperparameters mirror PPO_Args (ppo_cse/ppo.py:13-30); rollout length
mirrors RunnerArgs.num_steps_per_env=24 (ppo_cse/__init__.py:46).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import actor_critic as ac


@dataclass(frozen=True)
class PPOArgs:
    # ppo_cse/ppo.py:13-30
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    entropy_coef: float = 0.01
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    adaptation_module_learning_rate: float = 1e-3
    num_adaptation_module_substeps: int = 1
    schedule: str = "adaptive"
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    # RunnerArgs (ppo_cse/__init__.py:46)
    num_steps_per_env: int = 24
    # eval envs act with the teacher (true privileged obs) instead of the
    # student policy (ppo_cse/__init__.py:139-145 eval_expert)
    eval_expert: bool = False
    # Sharding-invariant mode: action noise from per-env RNG streams and
    # env-strided minibatches, so an n-device env-sharded run computes the
    # SAME training trajectory as the single-device run (asserted by
    # tests/test_parallel.py). Default off = reference semantics (one global
    # permutation over T*N, rollout_storage.py:100-139).
    sharding_invariant: bool = False
    # Stabilization addition (NOT in the reference): clamp the learned
    # per-dim policy std after each update. In the near-zero-reward early
    # phase of the MoB recipe (ji22 exp rewards ~1e-6), the entropy bonus
    # is the only nonvanishing gradient on std and can blow it up (observed
    # std 1.0 -> 3.0 at 4000 envs, which thrashes the robot into instant
    # falls). The clamp is inactive once real reward gradients appear.
    std_range: tuple = (0.05, 2.0)
    # Fuse the adaptation-module substep's forward pass into the PPO loss
    # pass (one shared (mb, 2100)x(2100, 256) GEMM instead of two). The
    # adaptation gradient is then evaluated at the pre-PPO-step parameters
    # instead of the post-step ones (ppo.py:163-189 runs the substep after
    # optimizer.step()) — a one-optimizer-step-stale gradient on the
    # supervised regression, with the update still applied to the post-step
    # parameters through the same separate Adam. Requires
    # num_adaptation_module_substeps == 1 (the reference default).
    # DEFAULT False (reference-exact interleaving) since the round-5 A/B
    # (results/ab_substep_r5, 400 iterations from an identical warm start):
    # tracking reward is identical but the fused one-step-stale gradient
    # trains the adaptation regression measurably worse (0.67 rising vs
    # 0.61 falling) and the fused mode's supposed perf win does not
    # reproduce (108.1 vs 104.2 ms/iter at 4096 envs).
    fused_adaptation_substep: bool = False


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    adapt_opt_state: Any
    lr: jnp.ndarray
    key: jax.Array
    iteration: jnp.ndarray


@struct.dataclass
class Transition:
    # NOTE: no `sigma` field — the policy std is a per-dim parameter that
    # is constant across the whole rollout (params don't change between
    # update calls), so the update reads it from the pre-update TrainState
    # instead of storing T*N broadcast copies (rollout_storage.py:36-50
    # stores the broadcast tensor; that costs a permute gather per update).
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_probs: jnp.ndarray
    mu: jnp.ndarray


def make_optimizers(args: PPOArgs):
    # scale_by_adam (without the LR) so the adaptive-KL learning rate can be
    # applied as a traced scalar each minibatch (ppo.py:126-132)
    tx = optax.chain(
        optax.clip_by_global_norm(args.max_grad_norm),
        optax.scale_by_adam(),
    )
    adapt_tx = optax.adam(args.adaptation_module_learning_rate)
    return tx, adapt_tx


def init_train_state(key: jax.Array, env, args: PPOArgs,
                     ac_args: ac.ACArgs = ac.ACArgs()) -> TrainState:
    k_params, k_loop = jax.random.split(key)
    params = ac.init_actor_critic(
        k_params, env.num_obs, env.num_privileged_obs, env.num_obs_history,
        env.num_actions, ac_args)
    tx, adapt_tx = make_optimizers(args)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        # the adaptation optimizer holds ONLY the adaptation module's
        # parameters, like the reference's separate Adam
        # (ppo_cse/ppo.py:60-63) — not zero-grad moments for actor/critic
        adapt_opt_state=adapt_tx.init(params["adaptation"]),
        lr=jnp.float32(args.learning_rate),
        key=k_loop,
        iteration=jnp.int32(0),
    )


def compute_gae(rewards, dones, values, last_values, gamma, lam,
                pmean=lambda x: x):
    """rollout_storage.py:76-90. rewards/dones/values: (T, N). pmean:
    cross-shard mean so the advantage moments are GLOBAL-batch under
    env sharding (matching the reference's full-batch normalization)."""
    def body(carry, xs):
        adv_next, v_next = carry
        rew, done, val = xs
        not_done = 1.0 - done
        delta = rew + not_done * gamma * v_next - val
        adv = delta + not_done * gamma * lam * adv_next
        return (adv, val), adv

    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_values), last_values),
        (rewards, dones.astype(jnp.float32), values), reverse=True)
    returns = advs + values
    # advantage normalization (rollout_storage.py:88-90)
    mean = pmean(advs.mean())
    var = pmean(jnp.mean((advs - mean) ** 2))
    advs = (advs - mean) / (jnp.sqrt(var) + 1e-8)
    return advs, returns


def make_train_fns(env, args: PPOArgs, ac_args: ac.ACArgs = ac.ACArgs(),
                   axis_name: str | None = None):
    """Returns train_iteration: one fully jittable (rollout + GAE + update)
    step operating on (TrainState, WorldState, obs_dict).

    axis_name: when set (multi-device data parallelism over the env-sharded
    mesh axis), gradients / KL / stats are pmean'd across shards so the
    replicated TrainState stays bitwise identical on every device —
    fully-replicated-learner DP, matching the reference's (dormant) rl_games
    multi_gpu semantics (SURVEY.md §2.7)."""
    tx, adapt_tx = make_optimizers(args)
    n_terms = env.n_terms

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def rollout(ts: TrainState, world, obs_dict):
        def step_fn(carry, _):
            key, world, obs_dict = carry
            key, k_act = jax.random.split(key)
            obs_h = obs_dict["obs_history"]
            mean, std = ac.distribution(ts.params, obs_h, ac_args)
            if args.sharding_invariant:
                # per-env noise streams: identical draws per env no matter
                # how the env axis is sharded across devices
                noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, 29), (mean.shape[-1],)))(
                    world.env.rng)
                actions = mean + std * noise
            else:
                actions = ac.sample_actions(k_act, mean, std)
            logp = ac.log_prob(mean, std, actions)
            values = ac.evaluate(ts.params, obs_h, obs_dict["privileged_obs"],
                                 ac_args)
            # train/eval env split (ppo_cse/__init__.py:136-146): the
            # trailing eval slice acts with the (sampled) student by default
            # — identical actions, so no extra compute — or the teacher when
            # eval_expert; only the train slice enters the PPO batch.
            B = obs_h.shape[0]
            n_tr = B * env.num_train_envs // env.num_envs
            if n_tr < B and args.eval_expert:
                t_mean = ac.act_teacher(ts.params, obs_h[n_tr:],
                                        obs_dict["privileged_obs"][n_tr:],
                                        ac_args)
                exec_actions = jnp.concatenate(
                    [actions[:n_tr],
                     ac.sample_actions(k_act, t_mean, std[n_tr:])], axis=0)
            else:
                exec_actions = actions
            world, next_obs, rew, done, info = env.step(world, exec_actions)
            # timeout bootstrapping (ppo.py:84-86)
            rew_b = rew + args.gamma * values * info["time_outs"]
            tr_slice = lambda x: x[:n_tr]
            # with bf16 compute the stored history rides HBM at half width
            # (the (T*N, 2100) buffer is the rollout's largest tensor); the
            # GEMMs cast to bf16 anyway, so storage loses no precision the
            # compute would have kept
            h_dt = (jnp.bfloat16 if ac_args.compute_dtype == "bfloat16"
                    else jnp.float32)
            tr = Transition(
                obs=tr_slice(obs_dict["obs"]),
                privileged_obs=tr_slice(obs_dict["privileged_obs"]),
                obs_history=tr_slice(obs_h).astype(h_dt),
                actions=tr_slice(actions),
                rewards=tr_slice(rew_b), dones=tr_slice(done),
                values=tr_slice(values), log_probs=tr_slice(logp),
                mu=tr_slice(mean))
            metrics = (info["episode_sums_at_reset"], info["num_resets"],
                       rew[:n_tr], info["mean_episode_length"],
                       info["eval_episode_sums_at_reset"],
                       info["eval_num_resets"])
            return (key, world, next_obs), (tr, metrics)

        key, k_roll = jax.random.split(ts.key)
        (k_roll, world, obs_dict), (traj, metrics) = jax.lax.scan(
            step_fn, (k_roll, world, obs_dict), None,
            length=args.num_steps_per_env)
        ts = ts.replace(key=key)
        return ts, world, obs_dict, traj, metrics

    def ppo_terms(params, obs_h, priv, actions, old_logp, old_mu, old_sigma,
                  target_v, adv, ret, latent):
        """Clipped-surrogate + value + entropy terms given the adaptation
        latent (shared with the adaptation loss in fused mode).

        (Negative result, round 3: computing the actor+critic first layers
        as one concatenated (2100, 1024) GEMM — ac.actor_critic_heads —
        was ~8 ms/iter SLOWER end-to-end: the per-minibatch weight concat
        + its slice-adjoint backward outweigh the GEMM merge.)"""
        mean = ac.actor_mean(params, obs_h, latent, ac_args)
        std = jnp.broadcast_to(params["std"], mean.shape)
        logp = ac.log_prob(mean, std, actions)
        value = ac.evaluate(params, obs_h, priv, ac_args)
        ent = ac.entropy(std)

        ratio = jnp.exp(logp - old_logp)
        surr = -adv * ratio
        surr_clipped = -adv * jnp.clip(ratio, 1 - args.clip_param,
                                       1 + args.clip_param)
        surrogate_loss = jnp.maximum(surr, surr_clipped).mean()

        if args.use_clipped_value_loss:
            v_clipped = target_v + jnp.clip(value - target_v,
                                            -args.clip_param, args.clip_param)
            v_loss = jnp.maximum((value - ret) ** 2,
                                 (v_clipped - ret) ** 2).mean()
        else:
            v_loss = ((ret - value) ** 2).mean()

        loss = (surrogate_loss + args.value_loss_coef * v_loss
                - args.entropy_coef * ent.mean())

        # KL for adaptive LR (ppo.py:118-124)
        kl = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (old_sigma ** 2 + (old_mu - mean) ** 2) / (2 * std ** 2) - 0.5,
            axis=-1).mean()
        return loss, (surrogate_loss, v_loss, kl)

    def ppo_loss(params, batch, old_std):
        obs_h, priv, actions, old_logp, old_mu, target_v, adv, ret = batch
        latent = ac.adaptation_module(params, obs_h, ac_args)
        return ppo_terms(params, obs_h, priv, actions, old_logp, old_mu,
                         old_std, target_v, adv, ret, latent)

    def _adaptation_split_losses(pred, priv, n_train):
        B = pred.shape[0]
        train_loss = jnp.mean((pred[:n_train] - priv[:n_train]) ** 2)
        test_loss = (jnp.mean((pred[n_train:] - priv[n_train:]) ** 2)
                     if n_train < B else train_loss)
        return train_loss, test_loss

    def adaptation_loss_fn(params, obs_h, priv, n_train=None):
        pred = ac.adaptation_module(params, obs_h, ac_args)
        B = pred.shape[0]
        if n_train is None:
            n_train = max(1, (B // 5) * 4)   # 80/20 split (ppo.py:163-183)
        return _adaptation_split_losses(pred, priv, n_train)

    def fused_grads(params, batch, old_std, n_train_ad):
        """Fused mode: ONE adaptation forward serves both the PPO loss
        (actor latent) and the supervised regression. The adaptation
        module's VJP is taken once and invoked with two real cotangents
        (the PPO loss's latent gradient; the regression's latent gradient)
        — no zero-scaled second backward through the actor/critic."""
        obs_h, priv, actions, old_logp, old_mu, target_v, adv, ret = batch
        latent, vjp_ad = jax.vjp(
            lambda p: ac.adaptation_module(p, obs_h, ac_args), params)

        loss, pb, aux = jax.vjp(
            lambda p, lat: ppo_terms(p, obs_h, priv, actions, old_logp,
                                     old_mu, old_std, target_v, adv, ret,
                                     lat),
            params, latent, has_aux=True)
        ct = loss * 0 + 1          # carries the shard_map varying type
        g_direct, g_latent = pb(ct)
        g_through_latent = vjp_ad(g_latent)[0]
        grads = jax.tree.map(jnp.add, g_direct, g_through_latent)

        if n_train_ad is None:
            n_train_ad = max(1, (latent.shape[0] // 5) * 4)
        (a_loss, a_test), pb_a = jax.vjp(
            lambda lat: _adaptation_split_losses(lat, priv, n_train_ad),
            latent)
        c_lat = pb_a((a_loss * 0 + 1, a_test * 0))[0]
        a_grads = vjp_ad(c_lat)[0]
        return loss, aux, grads, a_loss, a_test, a_grads

    def update(ts: TrainState, traj, last_obs_dict):
        T, N = traj.rewards.shape
        last_values = ac.evaluate(ts.params,
                                  last_obs_dict["obs_history"][:N],
                                  last_obs_dict["privileged_obs"][:N],
                                  ac_args)
        advs, returns = compute_gae(traj.rewards, traj.dones, traj.values,
                                    last_values, args.gamma, args.lam,
                                    pmean=_pmean)

        # pre-update policy std: constant across the rollout (see Transition)
        old_std = ts.params["std"]

        key, k_perm = jax.random.split(ts.key)
        mb_size = T * N // args.num_mini_batches
        M = args.num_mini_batches

        # The small per-sample tensors are packed into ONE buffer so
        # permutation/slicing is two coalesced operations instead of eight.
        nj = traj.actions.shape[-1]
        npv = traj.privileged_obs.shape[-1]
        packed = jnp.concatenate([
            traj.privileged_obs, traj.actions, traj.mu,
            traj.log_probs[..., None], traj.values[..., None],
            advs[..., None], returns[..., None]], axis=-1)

        if args.sharding_invariant:
            # env-strided minibatches: env n -> minibatch n % M. Every shard
            # contributes an equal share to each minibatch, so pmean'd
            # gradients equal the unsharded global-batch gradients exactly.
            # (A slice-based no-gather variant was tried and was SLOWER:
            # XLA re-laid-out each env-minor minibatch per step, 20 copies
            # instead of this one gather.)
            import numpy as _np
            assert N % M == 0, "env count per shard must divide minibatches"
            base = _np.arange(T * N).reshape(T, N)
            perm = jnp.concatenate(
                [jnp.asarray(base[:, mth::M].reshape(-1))
                 for mth in range(M)])
        else:
            # reference semantics (rollout_storage.py:100-139): one random
            # permutation over T*N reused across epochs.
            perm = jax.random.permutation(k_perm, T * N)

        # permute ONCE, then minibatches are contiguous dynamic slices
        # (gathering each (24k, 2100) minibatch per epoch x minibatch cost
        # ~30 ms/iteration); both gathers index the (T, N, ·) scan layout
        # directly (a flat reshape forced a 400 MB transpose copy)
        t_idx, n_idx = perm // N, perm % N
        packed_p = packed[t_idx, n_idx]
        obs_h_p = traj.obs_history[t_idx, n_idx]

        def get_batch(mth):
            return (jax.lax.dynamic_slice_in_dim(
                        obs_h_p, mth * mb_size, mb_size),
                    jax.lax.dynamic_slice_in_dim(
                        packed_p, mth * mb_size, mb_size))

        def unpack(p):
            priv = p[:, :npv]
            actions = p[:, npv:npv + nj]
            mu = p[:, npv + nj:npv + 2 * nj]
            logp, values, adv, ret = (p[:, npv + 2 * nj + i]
                                      for i in range(4))
            return priv, actions, logp, mu, values, adv, ret

        fused = (args.fused_adaptation_substep
                 and args.num_adaptation_module_substeps == 1)

        def minibatch_step(carry, mth):
            params, opt_state, adapt_opt_state, lr = carry
            obs_h, pk = get_batch(mth)
            priv, actions, logp, mu, values, adv, ret = unpack(pk)
            batch = (obs_h, priv, actions, logp, mu, values, adv, ret)
            # 80/20 split of the adaptation regression (ppo.py:163-183); in
            # sharding-invariant mode it is timestep-aligned so per-shard
            # subsets union to exactly the global subsets
            n_tr_ad = ((T * 4 // 5) * (mb_size // T)
                       if args.sharding_invariant else None)

            if fused:
                loss, (surr, v_loss, kl), grads, a_loss, a_test, a_grads = \
                    fused_grads(params, batch, old_std, n_tr_ad)
            else:
                (loss, (surr, v_loss, kl)), grads = jax.value_and_grad(
                    ppo_loss, has_aux=True)(params, batch, old_std)
            grads = jax.tree.map(_pmean, grads)
            kl = _pmean(kl)

            # adaptive-KL LR schedule (ppo.py:126-132)
            if args.desired_kl is not None and args.schedule == "adaptive":
                lr = jnp.where(kl > args.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl < args.desired_kl / 2.0) & (kl > 0.0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            if args.std_range is not None:
                params = {**params, "std": jnp.clip(
                    params["std"], args.std_range[0], args.std_range[1])}

            # adaptation-module supervised substep (ppo.py:166-189); the
            # separate Adam runs over the adaptation subtree only
            def adapt_apply(params, a_grads_ad, adapt_opt_state):
                a_grads_ad = jax.tree.map(_pmean, a_grads_ad)
                a_updates, adapt_opt_state = adapt_tx.update(
                    a_grads_ad, adapt_opt_state, params["adaptation"])
                new_ad = optax.apply_updates(params["adaptation"], a_updates)
                return {**params, "adaptation": new_ad}, adapt_opt_state

            if fused:
                params, adapt_opt_state = adapt_apply(
                    params, a_grads["adaptation"], adapt_opt_state)
            else:
                a_losses = []
                for _ in range(args.num_adaptation_module_substeps):
                    (a_loss, a_test), a_grads = jax.value_and_grad(
                        adaptation_loss_fn, has_aux=True)(
                        params, batch[0], batch[1], n_tr_ad)
                    params, adapt_opt_state = adapt_apply(
                        params, a_grads["adaptation"], adapt_opt_state)
                    a_losses.append((a_loss, a_test))
                a_loss = sum(l for l, _ in a_losses) / len(a_losses)
                a_test = sum(t for _, t in a_losses) / len(a_losses)

            return (params, opt_state, adapt_opt_state, lr), (
                loss, surr, v_loss, kl, a_loss, a_test)

        # one permutation reused across epochs (rollout_storage.py:100-139)
        mb_ids = jnp.tile(jnp.arange(args.num_mini_batches),
                          (args.num_learning_epochs,))

        (params, opt_state, adapt_opt_state, lr), aux = jax.lax.scan(
            minibatch_step, (ts.params, ts.opt_state, ts.adapt_opt_state, ts.lr),
            mb_ids)
        loss, surr, v_loss, kl, a_loss, a_test = jax.tree.map(jnp.mean, aux)
        ts = ts.replace(params=params, opt_state=opt_state,
                        adapt_opt_state=adapt_opt_state, lr=lr, key=key,
                        iteration=ts.iteration + 1)
        stats = {"loss": loss, "surrogate_loss": surr, "value_loss": v_loss,
                 "kl_mean": kl, "adaptation_loss": a_loss,
                 "adaptation_test_loss": a_test, "lr": lr}
        return ts, stats

    def train_iteration(ts: TrainState, world, obs_dict):
        ts, world, obs_dict, traj, metrics = rollout(ts, world, obs_dict)
        ts, stats = update(ts, traj, obs_dict)
        ep_sums, n_resets, rews, mean_ep_len, ep_sums_ev, n_resets_ev = metrics
        total_resets = _psum(jnp.sum(n_resets))
        total_resets_ev = _psum(jnp.sum(n_resets_ev))
        stats = {k: _pmean(v) for k, v in stats.items()}
        stats.update({
            # mean per-episode reward sums over episodes finished this iter,
            # per term + total, split train/eval (the train/episode/* and
            # eval/episode/* metrics, ppo_cse/__init__.py:156-180)
            "episode_reward_sums": _psum(jnp.sum(ep_sums, axis=0))
            / jnp.maximum(total_resets, 1),
            "num_episodes": total_resets,
            "eval_episode_reward_sums": _psum(jnp.sum(ep_sums_ev, axis=0))
            / jnp.maximum(total_resets_ev, 1),
            "eval_num_episodes": total_resets_ev,
            "mean_step_reward": _pmean(jnp.mean(rews)),
            "mean_episode_length": _pmean(mean_ep_len[-1]),
        })
        return ts, world, obs_dict, stats

    return train_iteration
