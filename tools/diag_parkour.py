#!/usr/bin/env python
"""Parkour failure diagnostics: roll a trained cat_ppo policy on ONE track
type pinned at ONE difficulty level and attribute every termination.

For each env's FIRST completed episode (all envs start freshly reset at the
pinned level, so first episodes are uncontaminated by curriculum moves):

- distance along the track at termination (the promotion rule needs
  > 0.8 * 12 m; go2_parkour.py:1158-1186),
- the hard-done reason (base/knee contact, lava, upsidedown, low base,
  timeout, diverged),
- the binding CaT constraint at the final step,
- the death-x histogram over the 12 m track.

Usage:
    python tools/diag_parkour.py --checkpoint checkpoints/parkour_promo_r2b_7k5.pkl.gz \
        --terrain gap --level 0 --num-envs 64 --steps 700 --cpu
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--terrain", default="gap")
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--easy-mode", action="store_true")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions from the policy distribution "
                         "instead of the mean (training-time behavior)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from train_vision import build_env
    from wtw_tpu.learn.cat_ppo import get_action_mean, rms_norm

    overrides = [f"terrain.min_init_map_level={args.level}",
                 f"terrain.max_init_map_level={args.level}",
                 "only_forwards=true", "only_forwards_velocity=0.8",
                 *args.set]
    env = build_env(args.num_envs, args.seed, terrain=args.terrain,
                    easy_mode=args.easy_mode, overrides=overrides)

    opener = (__import__("gzip").open if args.checkpoint.endswith(".gz")
              else open)
    with opener(args.checkpoint, "rb") as f:
        blob = pickle.load(f)
    ts = jax.tree.map(jnp.asarray, blob["ts"])

    # constraint column -> name
    col_names = []
    for n in env.cstr.names:
        a, b = env.cstr.offsets[n]
        col_names += [n] * (b - a)

    @jax.jit
    def step_fn(world, obs, key):
        obs_n = rms_norm(ts.obs_rms, obs)
        acts = get_action_mean(ts.params, obs_n)
        if args.stochastic:
            key, k = jax.random.split(key)
            std = jnp.exp(ts.params["actor_logstd"])
            acts = acts + std * jax.random.normal(k, acts.shape)
        world, obs, rew, done, info = env.step(world, acts)
        return world, obs, key, rew, info

    world = env.init_state(jax.random.PRNGKey(args.seed))
    # re-seat every env at the pinned level (restore_terrain_state resets
    # them at the track start)
    lvl = jnp.full((env.num_envs,), args.level, jnp.int32)
    world = env.restore_terrain_state(world, lvl)
    obs = env.get_observations(world)

    N = env.num_envs
    first_done = np.zeros(N, bool)
    first_dist = np.zeros(N, np.float32)
    first_len = np.zeros(N, np.float32)
    first_reason = np.array(["none"] * N, dtype=object)
    first_cstr = np.array(["none"] * N, dtype=object)
    ep_progress_prev = np.zeros(N, np.int32)
    key = jax.random.PRNGKey(args.seed + 7)

    max_x = np.zeros(N, np.float32)
    for t in range(args.steps):
        world, obs, key, rew, info = step_fn(world, obs, key)
        td = np.asarray(info["true_dones"])
        dist = np.asarray(info["dist_at_done"])
        reasons = {k: np.asarray(v) for k, v in info["done_reasons"].items()}
        amax = np.asarray(info["cstr_argmax_col"])
        prog = np.asarray(world.env.progress)
        alive_x = np.asarray(
            world.env.phys.base_pos[:, 0] - world.env.env_origin[:, 0])
        max_x = np.maximum(max_x, np.where(~first_done, alive_x, max_x))
        new = td & ~first_done
        if new.any():
            first_dist[new] = dist[new]
            first_len[new] = ep_progress_prev[new] * env.dt
            # priority order: physical deaths before timeout
            for nm in ("diverged", "lava", "upsidedown", "base_contact",
                       "knee_contact", "base_height", "timeout"):
                sel = new & reasons[nm] & (first_reason == "none")
                first_reason[sel] = nm
            for i in np.where(new)[0]:
                first_cstr[i] = col_names[int(amax[i])]
            first_done |= new
        ep_progress_prev = prog
        if first_done.all():
            break

    done_n = int(first_done.sum())
    track = env.track_length
    cross = first_dist > 0.8 * track
    out = {
        "terrain": args.terrain, "level": args.level,
        "easy_mode": args.easy_mode, "envs": N,
        "first_episodes_done": done_n,
        "still_alive": int((~first_done).sum()),
        "alive_max_x_mean": round(float(max_x[~first_done].mean()), 2)
        if (~first_done).any() else None,
        "cross_rate": round(float(cross.sum() / max(done_n, 1)), 3),
        "dist_mean": round(float(first_dist[first_done].mean()), 2)
        if done_n else None,
        "dist_p50": round(float(np.median(first_dist[first_done])), 2)
        if done_n else None,
        "dist_p90": round(float(np.percentile(first_dist[first_done], 90)), 2)
        if done_n else None,
        "eplen_mean_s": round(float(first_len[first_done].mean()), 2)
        if done_n else None,
        "reasons": {k: int((first_reason == k).sum())
                    for k in sorted(set(first_reason)) if k != "none"},
        "binding_cstr": {k: int((first_cstr == k).sum())
                         for k in sorted(set(first_cstr)) if k != "none"},
        "death_x_hist_1m_bins": [
            int(((first_dist >= i) & (first_dist < i + 1)
                 & first_done).sum()) for i in range(int(track) + 1)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
