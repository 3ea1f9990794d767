#!/usr/bin/env python
"""Two-phase NaN localizer for the parkour/CaT learner.

Phase 1 (--phase run): rebuild the exact failing config, run jitted
iterations with a per-iteration finiteness probe (one scalar transfer),
and dump the last-finite (ts, world, obs_n) to --out when the first
non-finite iteration is hit.

Phase 2 (--phase dissect): load the pre-NaN state and replay ONE
iteration decomposed — rollout step by step, GAE, value normalization,
then epoch/minibatch updates with per-minibatch diagnostics (ratio max,
adv std, logstd, grad norm) — printing where non-finites first appear.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(args):
    import jax
    from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
    from wtw_tpu.learn.cat_ppo import CatPPOArgs
    from wtw_tpu.models import load_robot
    from wtw_tpu.terrain import ParkourTerrainCfg
    from wtw_tpu.config import apply_overrides
    from scripts.train_parkour import TERRAIN_PRESETS

    cfg = ParkourCfg(
        num_envs=args.num_envs,
        soft_p_total_steps=24 * args.iterations,
        terrain=ParkourTerrainCfg(proportions=TERRAIN_PRESETS[args.terrain],
                                  easy_mode=args.easy_mode))
    cfg = apply_overrides(cfg, args.set)
    env = ParkourEnv(cfg, load_robot(cfg.robot), seed=args.seed)
    ppo = CatPPOArgs(num_steps=24, num_iterations=args.iterations)
    return env, ppo


def phase_run(args):
    import jax
    import jax.numpy as jnp
    from wtw_tpu.learn.cat_ppo import (init_train_state, make_train_fn,
                                       rms_norm, rms_update)
    env, ppo = build(args)
    world = env.init_state(jax.random.PRNGKey(args.seed))
    ts = init_train_state(jax.random.PRNGKey(args.seed + 1), env, ppo)
    obs = env.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    train = jax.jit(make_train_fn(env, ppo))

    @jax.jit
    def finite(ts, obs_n):
        leaves = jax.tree_util.tree_leaves((ts.params, ts.obs_rms.mean))
        ok = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
        return ok & jnp.all(jnp.isfinite(obs_n))

    for it in range(args.iterations):
        prev = (ts, world, obs_n)  # device refs only; no host transfer
        ts, world, obs_n, stats = train(ts, world, obs_n)
        ok = bool(finite(ts, obs_n))
        if it % 10 == 0 or not ok:
            print(f"it {it:4d} finite={ok} rew={float(stats['mean_step_reward']):.4f} "
                  f"vloss={float(stats['value_loss']):.4f}", flush=True)
        if not ok:
            host = jax.device_get(prev)
            with open(args.out, "wb") as f:
                pickle.dump({"ts": host[0], "world": host[1],
                             "obs_n": host[2], "iteration": it}, f)
            print(f"FIRST NON-FINITE at iteration {it}; pre-state -> {args.out}")
            return
    print("no NaN within budget")


def _chk(name, x):
    import jax.numpy as jnp
    import numpy as np
    a = np.asarray(x)
    bad = (~np.isfinite(a)).mean() if a.dtype.kind == "f" else 0.0
    mx = np.abs(a[np.isfinite(a)]).max() if a.dtype.kind == "f" and np.isfinite(a).any() else 0
    print(f"  {name:28s} nonfinite={bad:8.4%} max|x|={mx:.3e}", flush=True)
    return bad > 0


def phase_dissect(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wtw_tpu.learn import cat_ppo as C

    env, ppo = build(args)
    blob = pickle.load(open(args.out, "rb"))
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)
    ts, world, obs_n = to_dev(blob["ts"]), to_dev(blob["world"]), to_dev(blob["obs_n"])
    print(f"dissecting iteration {blob['iteration']}")

    step = jax.jit(env.step)
    key, k_roll = jax.random.split(ts.key)
    obs_rms = ts.obs_rms
    done, true_done = ts.next_done, ts.next_true_done
    traj = []
    import jax.random as jr
    kr = k_roll
    for t in range(ppo.num_steps):
        kr, k_act = jr.split(kr)
        mean = C.get_action_mean(ts.params, obs_n)
        std = jnp.exp(ts.params["actor_logstd"])
        actions = mean + std * jr.normal(k_act, mean.shape)
        logp, _ = C.log_prob_entropy(ts.params, obs_n, actions)
        value = C.get_value(ts.params, obs_n)
        world, next_obs, rew, done_prob, info = step(world, actions)
        bad = False
        bad |= _chk(f"t{t:02d} actions", actions)
        bad |= _chk(f"t{t:02d} next_obs", next_obs)
        bad |= _chk(f"t{t:02d} rew", rew)
        if bad:
            print(f"  ^^ first env-side non-finite at rollout step {t}")
            np.save("/tmp/nan_actions.npy", np.asarray(actions))
            return
        obs_rms = C.rms_update(obs_rms, next_obs)
        next_obs_n = C.rms_norm(obs_rms, next_obs)
        traj.append((obs_n, actions, logp, rew, done, true_done, value))
        obs_n, done = next_obs_n, done_prob
        true_done = info["true_dones"].astype(jnp.float32)
    stack = lambda i: jnp.stack([tr[i] for tr in traj])
    obs, actions, logps, rewards, dones, true_dones, values = (
        stack(i) for i in range(7))
    next_value = C.get_value(ts.params, obs_n)
    advs, returns = C.cat_gae(rewards, dones, true_dones, values, next_value,
                              done, true_done, ppo.gamma, ppo.gae_lambda)
    _chk("advs", advs); _chk("returns", returns)

    N = args.num_envs
    B = ppo.num_steps * N
    flat = lambda x: x.reshape((B,) + x.shape[2:])
    b_obs, b_actions, b_logp = flat(obs), flat(actions), flat(logps)
    b_adv, b_ret, b_val = flat(advs), flat(returns), flat(values)
    value_rms = C.rms_update(ts.value_rms, b_val)
    value_rms = C.rms_update(value_rms, b_ret)
    b_val_n = C.rms_norm(value_rms, b_val)
    b_ret_n = C.rms_norm(value_rms, b_ret)
    print(f"value_rms mean={float(value_rms.mean):.3e} var={float(value_rms.var):.3e}")
    _chk("b_ret_n", b_ret_n)

    frac = 1.0 - float(blob["iteration"]) / ppo.num_iterations
    lr = frac * ppo.learning_rate
    print(f"lr={lr:.2e}")
    tx = C.make_optimizer(ppo)
    params, opt_state = ts.params, ts.opt_state

    def loss_fn(params, mb):
        o, a, old_logp, adv, ret_n, val_n = mb
        logp, ent = C.log_prob_entropy(params, o, a)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = -adv_n * ratio
        pg2 = -adv_n * jnp.clip(ratio, 1 - ppo.clip_coef, 1 + ppo.clip_coef)
        pg_loss = jnp.maximum(pg1, pg2).mean()
        newv = C.rms_norm(value_rms, C.get_value(params, o))
        v_unc = jnp.square(newv - ret_n)
        v_cl = jnp.square(val_n + jnp.clip(newv - val_n, -ppo.clip_coef,
                                           ppo.clip_coef) - ret_n)
        v_loss = 0.5 * jnp.maximum(v_unc, v_cl).mean()
        loss = pg_loss - ppo.ent_coef * ent.mean() + ppo.vf_coef * v_loss
        aux = dict(pg=pg_loss, v=v_loss, ratio_max=ratio.max(),
                   ratio_min=ratio.min(), adv_std=adv.std(),
                   logp_min=logp.min(), old_logp_min=old_logp.min(),
                   ent=ent.mean())
        return loss, aux

    lg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    kr, k_perm = jr.split(kr)
    mb_size = B // ppo.num_minibatches
    for ep in range(ppo.update_epochs):
        k_perm, k_ep = jr.split(k_perm)
        perm = jr.permutation(k_ep, B)
        idxs = perm[: mb_size * ppo.num_minibatches].reshape(
            ppo.num_minibatches, mb_size)
        for m in range(ppo.num_minibatches):
            idx = idxs[m]
            mb = (b_obs[idx], b_actions[idx], b_logp[idx], b_adv[idx],
                  b_ret_n[idx], b_val_n[idx])
            (loss, aux), grads = lg(params, mb)
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                 for g in jax.tree_util.tree_leaves(grads)))
            logstd = params["actor_logstd"]
            print(f"ep{ep} mb{m}: loss={float(loss):.4f} pg={float(aux['pg']):.4f} "
                  f"v={float(aux['v']):.4f} ratio=[{float(aux['ratio_min']):.2e},"
                  f"{float(aux['ratio_max']):.2e}] adv_std={float(aux['adv_std']):.3e} "
                  f"logp_min={float(aux['logp_min']):.1f} gnorm={float(gnorm):.3e} "
                  f"logstd=[{float(logstd.min()):.2f},{float(logstd.max()):.2f}]",
                  flush=True)
            if not np.isfinite(float(loss)) or not np.isfinite(float(gnorm)):
                print("  ^^ FIRST NON-FINITE minibatch")
                return
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["run", "dissect"], required=True)
    ap.add_argument("--num-envs", type=int, default=2048)
    ap.add_argument("--iterations", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--terrain", default="mixed")
    ap.add_argument("--easy-mode", action="store_true", default=True)
    ap.add_argument("--set", action="append",
                    default=["only_forwards=true", "only_forwards_velocity=0.8"])
    ap.add_argument("--out", default="/tmp/prenan.pkl")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    {"run": phase_run, "dissect": phase_dissect}[args.phase](args)
