#!/usr/bin/env python
"""Profile the hot path and print per-XLA-op device time, aggregated.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profile_step.py \
      [--mode env|train] [--num-envs 4096] [--iters 3] [--top 40]

Parses the xplane proto directly (the tensorboard_plugin_profile converters
are broken in this image). Groups ops by a coarse name prefix so fusions
with the same stem aggregate.
"""
import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        # source-file:line attribution from the event metadata stats
        sources = {}
        for m in plane.event_metadata.values():
            for st in m.stats:
                if stat_names.get(st.metadata_id) == "source":
                    sources[m.name] = st.str_value.replace("/root/repo/", "")
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9   # -> ms
                counts[name] += 1
        if not totals:
            continue
        total_ms = sum(totals.values())
        print(f"\n=== plane {plane.name}: total device {total_ms:.2f} ms ===")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for name, ms in rows:
            src = sources.get(name, "")
            print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:86]}")
            if src:
                print(f"             `- {src}")
        return


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="env", choices=["env", "train", "parse"])
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/wtw_prof")
    ap.add_argument("--dtype", default="bfloat16",
                    help="network GEMM compute dtype (matches bench.py)")
    args = ap.parse_args()

    if args.mode == "parse":
        parse_xplane(args.logdir, args.top)
        return

    import jax
    import jax.numpy as jnp
    from wtw_tpu.config import go1_mob_config
    from wtw_tpu.envs import LeggedEnv
    from wtw_tpu.models import load_robot

    cfg = go1_mob_config(num_envs=args.num_envs)
    env = LeggedEnv(cfg, load_robot("go1"))
    world = env.init_state(jax.random.PRNGKey(0))
    acts = jnp.zeros((env.num_envs, env.num_actions))

    if args.mode == "env":
        def body(w, _):
            w, _, rew, _, _ = env.step(w, acts)
            return w, rew
        fn = jax.jit(lambda w: jax.lax.scan(body, w, None, length=24)[0])
        state = fn(world)  # compile
        jax.block_until_ready(state.env.episode_length)
        run = lambda s: fn(s)
        done = lambda s: s.env.episode_length
    else:
        from wtw_tpu.learn import PPOArgs
        from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns
        from wtw_tpu.models.actor_critic import ACArgs
        ppo_args = PPOArgs()
        ac_args = ACArgs(compute_dtype=args.dtype)
        world, obs_dict = env.get_observations(world)
        ts = init_train_state(jax.random.PRNGKey(1), env, ppo_args, ac_args)
        fn = jax.jit(make_train_fns(env, ppo_args, ac_args))
        ts, world, obs_dict, stats = fn(ts, world, obs_dict)
        jax.block_until_ready(stats["loss"])
        state = (ts, world, obs_dict)

        def run(s):
            ts, w, o = s
            ts, w, o, st = fn(ts, w, o)
            return (ts, w, o)

        done = lambda s: s[1].env.episode_length

    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        state = run(state)
    jax.block_until_ready(done(state))
    jax.profiler.stop_trace()
    import time
    t0 = time.time()
    for _ in range(args.iters):
        state = run(state)
    jax.block_until_ready(done(state))
    wall = (time.time() - t0) / args.iters
    n_steps = 24 * args.num_envs
    print(f"wall/iter {wall*1000:.1f} ms  ({n_steps/wall:,.0f} env-steps/s)")
    parse_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
