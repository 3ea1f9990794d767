#!/usr/bin/env python
"""Benchmark: env-steps/s of the full jitted PPO_CSE training iteration
(24-step rollout × N envs × 4 physics substeps + PPO update) on the Go1
gait-conditioned MoB task — the reference's flagship workload
(scripts/go1/train.py with 4000 envs on one NVIDIA GPU; the reference
publishes no throughput numbers, see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: fraction of the BASELINE.json north-star per-chip rate
(>=5M aggregate env-steps/s at 4096 envs/host on v5p-16 => 1.25M/chip).
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096,
                    help="per-device env count")
    # enough iterations that one straggler dispatch doesn't skew the
    # sustained-rate estimate (the r3 driver capture read 79.1 ms where
    # three same-code sessions measured 76.2-76.4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", choices=["train", "env", "scaling"],
                    default="train")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="network GEMM compute dtype (params/opt stay fp32)")
    ap.add_argument("--devices", type=int, default=0,
                    help="scaling mode: devices to use (0 = all)")
    ap.add_argument("--sharding-invariant", action="store_true",
                    help="bench the sharding-invariant training mode "
                         "instead of the reference's random-permutation "
                         "minibatching")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (pair with XLA_FLAGS="
                         "--xla_force_host_platform_device_count=N for a "
                         "virtual mesh; validates the distributed path "
                         "mechanically — virtual devices share host cores, "
                         "so the efficiency number is a lower bound)")
    args_cli = ap.parse_args()
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args_cli.mode == "scaling":
        return bench_scaling(args_cli)

    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu.config import go1_mob_config
    from wtw_tpu.envs import LeggedEnv
    from wtw_tpu.learn import PPOArgs
    from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns
    from wtw_tpu.models import load_robot
    import dataclasses

    # the true flagship workload: actuator-net torque model (converted
    # reference weights), 15 commands, 70-dim obs, 30-step history
    cfg = go1_mob_config(num_envs=args_cli.num_envs)
    env = LeggedEnv(cfg, load_robot("go1"))
    # default = exact reference minibatching semantics
    # (rollout_storage.py:100-139); --sharding-invariant benches the
    # multi-device-consistent mode (per-env RNG streams + env-strided
    # minibatches; tests/test_parallel.py)
    ppo_args = PPOArgs(sharding_invariant=args_cli.sharding_invariant)
    from wtw_tpu.models.actor_critic import ACArgs
    ac_args = ACArgs(compute_dtype=args_cli.dtype)

    world = env.init_state(jax.random.PRNGKey(0))
    world, obs_dict = env.get_observations(world)
    ts = init_train_state(jax.random.PRNGKey(1), env, ppo_args, ac_args)

    steps_per_iter = ppo_args.num_steps_per_env * env.num_envs

    # State buffers are donated (the training loop carries them in place —
    # exactly what runner.py does) and the timed loop dispatches all
    # iterations before blocking ONCE: this measures sustained device
    # throughput the way a real training run pays it (runner.py syncs only
    # at log boundaries), instead of adding a host<->TPU RPC round trip to
    # every iteration (~20 ms over the remote axon link).
    if args_cli.mode == "train":
        fn = jax.jit(make_train_fns(env, ppo_args, ac_args),
                     donate_argnums=(0,))

        def run_once(state):
            ts, world, obs_dict = state
            ts, world, obs_dict, stats = fn(ts, world, obs_dict)
            return (ts, world, obs_dict), stats["loss"]

        state = (ts, world, obs_dict)
    else:
        def body(world, _):
            world, _, rew, _, _ = env.step(
                world, jnp.zeros((env.num_envs, env.num_actions)))
            return world, rew

        roll = jax.jit(lambda w: jax.lax.scan(
            body, w, None, length=ppo_args.num_steps_per_env)[0],
            donate_argnums=(0,))

        def run_once(world):
            w = roll(world)
            return w, w.env.episode_length

        state = world

    t_compile = time.time()
    for _ in range(args_cli.warmup):
        state, sync = run_once(state)
    jax.block_until_ready(sync)
    compile_s = time.time() - t_compile

    t0 = time.time()
    for _ in range(args_cli.iters):
        state, sync = run_once(state)
    jax.block_until_ready(sync)
    dt = (time.time() - t0) / args_cli.iters

    env_steps_per_s = steps_per_iter / dt
    baseline_per_chip = 5_000_000 / 4   # v5p-16 => 4 chips
    result = {
        "metric": f"env_steps_per_s_{args_cli.mode}_go1_mob_{args_cli.num_envs}envs",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(env_steps_per_s / baseline_per_chip, 4),
    }
    mfu = (_mfu(ts.params, ppo_args, env, dt, jax.devices()[0].device_kind)
           if args_cli.mode == "train" else None)
    if mfu is not None:
        result["mfu"] = mfu["mfu"]
        result["achieved_tflops"] = mfu["achieved_tflops"]
    print(json.dumps(result))
    print(f"# iter time {dt*1000:.1f} ms | warmup+compile {compile_s:.1f} s "
          f"| device {jax.devices()[0].device_kind}", file=sys.stderr)
    if mfu is not None:
        print(f"# MFU {100*mfu['mfu']:.1f}% — {mfu['achieved_tflops']:.1f} "
              f"achieved TFLOP/s vs {mfu['peak_tflops']:.0f} bf16 peak "
              f"({mfu['flops_per_iter']/1e12:.2f} TFLOP/iter, analytic "
              f"network-GEMM count: rollout policy forwards + PPO update "
              f"fwd/bwd; physics excluded)", file=sys.stderr)


# Peak dense-matmul throughput per chip, bf16 (the compute dtype of every
# network GEMM in this workload). Sources: Google Cloud TPU docs
# (v5e 197 bf16 TFLOP/s; v5p 459; v4 275; v6e 918).
_PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5": 459.0,
    "TPU v5p": 459.0, "TPU v4": 275.0, "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _mfu(params, ppo_args, env, dt_s, device_kind):
    """Model-FLOPs-utilization of one train iteration against the chip's
    bf16 matmul peak. The FLOP count is ANALYTIC over the network GEMMs
    (XLA's cost_analysis counts each lax.scan body once, understating the
    24-step rollout and 5x4-minibatch update ~20x): per sample, a forward
    pass costs 2*prod(W.shape) per layer; the update's backward adds dW
    (same cost) for every layer and dX for every layer except each tower's
    input layer (the obs-history input needs no gradient). The fused
    adaptation substep runs one shared adaptation forward and two
    adaptation backwards. The physics engine is excluded — this is the
    standard model-FLOPs convention, and it makes the number a LOWER bound
    on hardware utilization."""
    peak = _PEAK_BF16_TFLOPS.get(device_kind)
    if peak is None or params is None:
        return None
    import numpy as _np

    def tower(layers):
        f0 = int(_np.prod(layers[0]["w"].shape))      # input layer MACs
        fh = sum(int(_np.prod(l["w"].shape)) for l in layers[1:])
        return f0, fh

    f0a, fha = tower(params["adaptation"])
    f0p, fhp = tower(params["actor"])
    f0c, fhc = tower(params["critic"])
    fwd_all = f0a + fha + f0p + fhp + f0c + fhc       # MACs/sample, fwd

    T = ppo_args.num_steps_per_env
    N = env.num_envs
    samples_update = T * N * ppo_args.num_learning_epochs
    # per update sample: fwd + dW on everything, dX on non-input layers,
    # plus the adaptation substep's second backward (dW + dX, shared fwd)
    per_sample_update = (2 * fwd_all + (fha + fhp + fhc)
                         + (f0a + 2 * fha))
    flops = 2.0 * (T * N * fwd_all                     # rollout forwards
                   + samples_update * per_sample_update)
    achieved = flops / dt_s / 1e12
    return {"mfu": round(achieved / peak, 4),
            "achieved_tflops": round(achieved, 2),
            "peak_tflops": peak,
            "flops_per_iter": flops}




def bench_scaling(args_cli):
    """Multi-device scaling: the full distributed PPO_CSE iteration on a
    1-D env-sharded mesh (envs per device constant = weak scaling). On a
    multi-chip slice this measures the BASELINE.md >=85% scaling-efficiency
    target; call `jax.distributed.initialize()` first on multi-host."""
    import dataclasses

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from wtw_tpu.config import go1_mob_config
    from wtw_tpu.envs import LeggedEnv
    from wtw_tpu.learn import PPOArgs
    from wtw_tpu.learn.ppo_cse import init_train_state
    from wtw_tpu.models import load_robot
    from wtw_tpu.models.actor_critic import ACArgs
    from wtw_tpu.parallel import make_distributed_train_fn, shard_world
    from wtw_tpu.parallel.mesh import AXIS, replicate

    devices = jax.devices()
    n_dev = args_cli.devices or len(devices)
    devices = np.array(devices[:n_dev])
    mesh = Mesh(devices, (AXIS,))
    total_envs = args_cli.num_envs * n_dev

    cfg = go1_mob_config(num_envs=total_envs)
    cfg = dataclasses.replace(
        cfg, control=dataclasses.replace(cfg.control, control_type="P"))
    # env-internal psums (reward-sign test, curriculum sync) need the mesh
    # axis bound; init_state runs OUTSIDE shard_map, so init with a plain
    # env and step with an axis-aware one (same arrays, same shapes).
    env_init = LeggedEnv(cfg, load_robot("go1"))
    env = LeggedEnv(cfg, load_robot("go1"), axis_name=AXIS)
    ppo_args = PPOArgs()

    world = env_init.init_state(jax.random.PRNGKey(0))
    world, obs_dict = env_init.get_observations(world)
    ts = init_train_state(jax.random.PRNGKey(1), env, ppo_args)
    world, obs_dict = shard_world(mesh, world, obs_dict)
    ts = replicate(mesh, ts)
    train = make_distributed_train_fn(env, ppo_args, ACArgs(), mesh, ts,
                                      world, obs_dict)

    steps_per_iter = ppo_args.num_steps_per_env * total_envs
    t_c = time.time()
    for _ in range(args_cli.warmup):
        ts, world, obs_dict, stats = train(ts, world, obs_dict)
        jax.block_until_ready(stats["loss"])
    compile_s = time.time() - t_c
    t0 = time.time()
    for _ in range(args_cli.iters):
        ts, world, obs_dict, stats = train(ts, world, obs_dict)
    jax.block_until_ready(stats["loss"])
    dt = (time.time() - t0) / args_cli.iters

    aggregate = steps_per_iter / dt
    result = {
        "metric": f"env_steps_per_s_scaling_{n_dev}dev_"
                  f"{args_cli.num_envs}envs_per_dev",
        "value": round(aggregate, 1),
        "unit": "aggregate env-steps/s",
        "vs_baseline": round(aggregate / 5_000_000, 4),
    }
    print(json.dumps(result))
    print(f"# {n_dev} devices | {aggregate / n_dev:.0f} steps/s/device | "
          f"iter {dt*1000:.1f} ms | compile {compile_s:.1f} s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
