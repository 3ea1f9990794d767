"""DDPG with expert demonstrations + recurrent vision distillation.

Re-design of the reference's two-stage vision pipeline:

1. algos/DDPG_demos_generate.py:339-431 — roll out a trained (PPO) expert
   and fill a sequence replay buffer with demonstrations
   (`generate_demos`);
2. algos/DDPG_demos_rnn_vision.py:297-703 — train a depth-vision student:
   depth CNN (Conv 16/32/32 + MaxPool -> 128 latent, :297-327), GRU actor
   over [vision latent(128), proprio(45)] (:363-392), an ensemble of
   CRITIC_NB=10 MLP Q-networks with LayerNorm (:343-361), TD3-style
   clipped-noise min-of-2 random targets (:571-585), CaT-scaled targets
   (1 - p_done) on both reward and bootstrap (:585), 50/50 expert/online
   batches (:543-560), vision latent refreshed every 5 env steps
   (:494-497), depth stored uint8 (:523-525).

Sequence replay is a fixed-shape on-device ring over (time, env) with
windowed sampling + episode-boundary masks (SeqReplayBuffer,
DDPG_demos_generate.py:120-334).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .cat_ppo import init_mlp, mlp_apply
from .cat_ppornn import gru_cell, init_gru


@dataclass(frozen=True)
class DDPGArgs:
    critic_lr: float = 3e-4
    actor_lr: float = 3e-4
    buffer_steps: int = 512          # ring length in env steps
    learning_starts: int = 64        # env steps before updates
    gamma: float = 0.99
    policy_frequency: int = 2
    tau: float = 0.005
    batch_size: int = 64             # sequences per update (half expert)
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    seq_len: int = 5
    critic_nb: int = 10
    updates_per_step: int = 8
    vis_hw: int = 48
    vision_latent: int = 128
    rnn_hidden: int = 256
    proprio_dim: int = 45
    vision_update_interval: int = 5
    action_low: float = -1.0
    action_high: float = 1.0
    # hold actor (not Q/target) updates for this many env steps after a BC
    # warm start, so the fresh Q ensemble fits the warm-started policy
    # before its gradients steer the actor; ignored when bc_batches == 0
    actor_delay_env_steps: int = 65536


# ----------------------------------------------------------------------
# vision backbone (DepthOnlyFCBackbone58x87, :297-327)
# ----------------------------------------------------------------------
def init_vision(key, args: DDPGArgs):
    ks = jax.random.split(key, 5)
    he = lambda k, shape, fan: jax.random.normal(k, shape) * np.sqrt(2.0 / fan)
    return {
        "c1": {"w": he(ks[0], (5, 5, 1, 16), 25), "b": jnp.zeros(16)},
        "c2": {"w": he(ks[1], (4, 4, 16, 32), 16 * 16), "b": jnp.zeros(32)},
        "c3": {"w": he(ks[2], (3, 3, 32, 32), 9 * 32), "b": jnp.zeros(32)},
        "l1": init_mlp(ks[3], [1568, args.vision_latent], 1.0)[0],
        "l2": init_mlp(ks[4], [args.vision_latent, args.vision_latent], 1.0)[0],
    }


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def vision_apply(params, img):
    """img: (B, H, W) float in [0, 1] -> (B, latent)."""
    x = img[..., None]
    x = _maxpool2(jax.nn.leaky_relu(_conv(x, params["c1"])))
    x = _maxpool2(jax.nn.leaky_relu(_conv(x, params["c2"])))
    x = jax.nn.leaky_relu(_conv(x, params["c3"]))
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.leaky_relu(x @ params["l1"]["w"] + params["l1"]["b"])
    x = x @ params["l2"]["w"] + params["l2"]["b"]
    return jax.nn.elu(x)


# ----------------------------------------------------------------------
# actor + critics (:329-392)
# ----------------------------------------------------------------------
def init_actor(key, num_actions, args: DDPGArgs):
    k1, k2 = jax.random.split(key)
    return {
        "memory": init_gru(k1, args.vision_latent + args.proprio_dim,
                           args.rnn_hidden),
        "head": init_mlp(k2, [args.rnn_hidden, 512, 256, 128, num_actions],
                         1.0),
    }


def actor_apply(params, proprio, vision_latent, hidden, args: DDPGArgs):
    """One step. proprio (B, 45), vision_latent (B, 128), hidden (B, 256)."""
    x = jnp.concatenate([proprio, vision_latent], axis=-1)
    h = gru_cell(params["memory"], x, hidden)
    y = h
    for i, lyr in enumerate(params["head"][:-1]):
        y = jax.nn.elu(y @ lyr["w"] + lyr["b"])
    last = params["head"][-1]
    mu = jnp.tanh(y @ last["w"] + last["b"])
    scale = (args.action_high - args.action_low) / 2.0
    bias = (args.action_high + args.action_low) / 2.0
    return mu * scale + bias, h


def init_q(key, priv_dim, num_actions):
    """QNetworkVanilla (:343-361): MLP + LayerNorm on [priv_obs, action]."""
    ks = jax.random.split(key, 4)
    sizes = [(priv_dim + num_actions, 512), (512, 256), (256, 128), (128, 1)]
    params = []
    for k, (i, o) in zip(ks, sizes):
        bound = 1.0 / np.sqrt(i)
        params.append({
            "w": jax.random.uniform(k, (i, o), minval=-bound, maxval=bound),
            "b": jnp.zeros(o),
            "ln_g": jnp.ones(o) if o > 1 else None,
            "ln_b": jnp.zeros(o) if o > 1 else None,
        })
    return params


def q_apply(params, priv_obs, actions):
    x = jnp.concatenate([priv_obs, actions], axis=-1)
    for i, lyr in enumerate(params):
        x = x @ lyr["w"] + lyr["b"]
        if lyr["ln_g"] is not None:
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            x = (x - mu) / jnp.sqrt(var + 1e-5) * lyr["ln_g"] + lyr["ln_b"]
            x = jax.nn.elu(x)
    return x[..., 0]


# ----------------------------------------------------------------------
# sequence replay buffer (SeqReplayBuffer, DDPG_demos_generate.py:120-334)
# ----------------------------------------------------------------------
@struct.dataclass
class SeqBuffer:
    obs: jnp.ndarray            # (T, N, proprio)
    priv: jnp.ndarray           # (T, N, priv)
    vobs: jnp.ndarray           # (T, N, H, W) uint8
    actions: jnp.ndarray        # (T, N, act)
    rewards: jnp.ndarray        # (T, N)
    done_prob: jnp.ndarray      # (T, N) CaT termination probabilities
    true_dones: jnp.ndarray     # (T, N)
    hidden_in: jnp.ndarray      # (T, N, rnn) actor hidden BEFORE the step
    pos: jnp.ndarray            # () int32 write cursor
    filled: jnp.ndarray         # () int32


def init_buffer(args: DDPGArgs, num_envs, priv_dim, act_dim) -> SeqBuffer:
    """The wide per-step tensors (obs/priv/hidden) are stored in bf16 —
    with TWO resident buffers (online ring + expert demos) the f32 variants
    OOM a 16 GB chip at 1024 envs x 512 steps; depth frames are uint8
    (DDPG_demos_rnn_vision.py:523-525). buffer_sample casts back to f32."""
    T, N = args.buffer_steps, num_envs
    h = jnp.bfloat16
    return SeqBuffer(
        obs=jnp.zeros((T, N, args.proprio_dim), h),
        priv=jnp.zeros((T, N, priv_dim), h),
        vobs=jnp.zeros((T, N, args.vis_hw, args.vis_hw), jnp.uint8),
        actions=jnp.zeros((T, N, act_dim)),
        rewards=jnp.zeros((T, N)),
        done_prob=jnp.zeros((T, N)),
        true_dones=jnp.zeros((T, N)),
        hidden_in=jnp.zeros((T, N, args.rnn_hidden), h),
        pos=jnp.int32(0), filled=jnp.int32(0))


def buffer_astype(buf: SeqBuffer) -> SeqBuffer:
    """Cast a loaded (possibly f32, pre-bf16) demo buffer to the storage
    dtypes init_buffer uses, so old rb_demos.pkl files stay usable without
    doubling their device residency."""
    h = jnp.bfloat16
    return buf.replace(
        obs=jnp.asarray(buf.obs, h), priv=jnp.asarray(buf.priv, h),
        hidden_in=jnp.asarray(buf.hidden_in, h))


def buffer_add(buf: SeqBuffer, obs, priv, vobs_u8, actions, rewards,
               done_prob, true_dones, hidden_in) -> SeqBuffer:
    i = buf.pos
    st = lambda a, v: a.at[i].set(jnp.asarray(v, a.dtype))
    return buf.replace(
        obs=st(buf.obs, obs), priv=st(buf.priv, priv),
        vobs=buf.vobs.at[i].set(vobs_u8),
        actions=st(buf.actions, actions),
        rewards=st(buf.rewards, rewards),
        done_prob=st(buf.done_prob, done_prob),
        true_dones=st(buf.true_dones, true_dones),
        hidden_in=st(buf.hidden_in, hidden_in),
        pos=(buf.pos + 1) % buf.obs.shape[0],
        filled=jnp.minimum(buf.filled + 1, buf.obs.shape[0]))


def buffer_sample(buf: SeqBuffer, key, batch: int, seq_len: int):
    """Sample `batch` (env, start) windows of length seq_len (+1 for the
    next-step targets). Returns dict of (B, L, ...) arrays + mask (B, L):
    steps after an in-window hard done are masked out (:273-334)."""
    T, N = buf.rewards.shape[:2]
    k1, k2 = jax.random.split(key)
    # offsets are relative to the OLDEST entry so windows never cross the
    # ring's write seam once the buffer has wrapped (oldest entry sits at
    # `pos` when full, at 0 otherwise)
    max_start = jnp.maximum(buf.filled - seq_len - 1, 1)
    offsets = jax.random.randint(k1, (batch,), 0, max_start)
    oldest = jnp.where(buf.filled >= T, buf.pos, 0)
    starts = (oldest + offsets) % T
    envs_ = jax.random.randint(k2, (batch,), 0, N)
    t_idx = (starts[:, None] + jnp.arange(seq_len)[None, :]) % T  # (B, L)

    g = lambda a: a[t_idx, envs_[:, None]]
    g1 = lambda a: a[(t_idx + 1) % T, envs_[:, None]]
    dones = g(buf.true_dones)
    # valid until the first hard done inside the window (inclusive)
    prior_done = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(dones[:, :1]), dones[:, :-1]], 1), 1)
    mask = (prior_done == 0).astype(jnp.float32)
    f32 = lambda a: a.astype(jnp.float32)
    return {
        "obs": f32(g(buf.obs)), "priv": f32(g(buf.priv)),
        "vobs": g(buf.vobs).astype(jnp.float32) / 255.0,
        "actions": g(buf.actions), "rewards": g(buf.rewards),
        "done_prob": g(buf.done_prob), "true_dones": dones,
        "next_obs": f32(g1(buf.obs)), "next_priv": f32(g1(buf.priv)),
        "next_vobs": g1(buf.vobs).astype(jnp.float32) / 255.0,
        "hidden_in0": f32(buf.hidden_in[starts, envs_]),        # (B, rnn)
        "hidden_out0": f32(buf.hidden_in[(starts + 1) % T, envs_]),
        "mask": mask,
    }


# ----------------------------------------------------------------------
# training state + update
# ----------------------------------------------------------------------
@struct.dataclass
class DDPGTrainState:
    vision: Any
    actor: Any
    qs: Any                 # stacked pytree, leading axis critic_nb
    q_targets: Any
    actor_opt: Any
    q_opt: Any
    key: jax.Array
    step: jnp.ndarray


def init_train_state(key, priv_dim, act_dim, args: DDPGArgs,
                     actor_tx, q_tx) -> DDPGTrainState:
    k1, k2, k3 = jax.random.split(key, 3)
    vision = init_vision(k1, args)
    actor = init_actor(k2, act_dim, args)
    qs = jax.vmap(lambda k: init_q(k, priv_dim, act_dim))(
        jax.random.split(k3, args.critic_nb))
    return DDPGTrainState(
        vision=vision, actor=actor, qs=qs, q_targets=qs,
        actor_opt=actor_tx.init((actor, vision)), q_opt=q_tx.init(qs),
        key=key, step=jnp.int32(0))


def make_update_fns(args: DDPGArgs):
    actor_tx = optax.chain(optax.clip_by_global_norm(0.5),
                           optax.adam(args.actor_lr))
    q_tx = optax.chain(optax.clip_by_global_norm(0.5),
                       optax.adam(args.critic_lr))

    def run_actor_seq(actor, vision, obs_seq, vobs_seq, h0):
        """Run the actor over a (B, L, ...) window. The vision latent is
        refreshed every `vision_update_interval` steps (:494-497)."""
        B, L = obs_seq.shape[:2]
        vlat_all = vision_apply(vision, vobs_seq.reshape(B * L,
                                                         *vobs_seq.shape[2:]))
        vlat_all = vlat_all.reshape(B, L, -1)
        k = args.vision_update_interval
        hold_idx = (jnp.arange(L) // k) * k
        vlat_held = vlat_all[:, hold_idx]

        def step(h, xs):
            o_t, v_t = xs
            a, h2 = actor_apply(actor, o_t, v_t, h, args)
            return h2, a

        o_tm = jnp.swapaxes(obs_seq, 0, 1)
        v_tm = jnp.swapaxes(vlat_held, 0, 1)
        _, a_tm = jax.lax.scan(step, h0, (o_tm, v_tm))
        return jnp.swapaxes(a_tm, 0, 1)                        # (B, L, act)

    def q_update(ts: DDPGTrainState, batch):
        key, k_noise, k_sel = jax.random.split(ts.key, 3)
        B, L = batch["rewards"].shape
        flatten = lambda x: x.reshape((B * L,) + x.shape[2:])

        noise = jnp.clip(
            args.policy_noise * jax.random.normal(
                k_noise, batch["actions"].shape),
            -args.noise_clip, args.noise_clip)
        next_actions = run_actor_seq(ts.actor, ts.vision, batch["next_obs"],
                                     batch["next_vobs"], batch["hidden_out0"])
        next_actions = jnp.clip(next_actions + noise, args.action_low,
                                args.action_high)

        sel = jax.random.permutation(k_sel, args.critic_nb)[:2]
        two = jax.tree.map(lambda x: x[sel], ts.q_targets)
        q_next = jax.vmap(lambda p: q_apply(p, flatten(batch["next_priv"]),
                                            flatten(next_actions)))(two)
        min_q_next = jnp.min(q_next, axis=0)                    # (B*L,)
        p = flatten(batch["done_prob"])
        td = flatten(batch["true_dones"])
        target = ((1 - p) * flatten(batch["rewards"])
                  + (1 - p) * (1 - td) * args.gamma * min_q_next)  # :585
        target = jax.lax.stop_gradient(target)
        mask = flatten(batch["mask"])
        n_valid = jnp.maximum(mask.sum(), 1.0)

        def q_loss_fn(qs):
            qv = jax.vmap(lambda pq: q_apply(pq, flatten(batch["priv"]),
                                             flatten(batch["actions"])))(qs)
            return (jnp.square(qv - target[None, :]) * mask[None, :]).sum() \
                / (n_valid * args.critic_nb)

        q_loss, grads = jax.value_and_grad(q_loss_fn)(ts.qs)
        updates, q_opt = q_tx.update(grads, ts.q_opt, ts.qs)
        qs = optax.apply_updates(ts.qs, updates)
        return ts.replace(qs=qs, q_opt=q_opt, key=key), q_loss

    def target_update(ts: DDPGTrainState):
        new_t = jax.tree.map(lambda p, t: args.tau * p + (1 - args.tau) * t,
                             ts.qs, ts.q_targets)
        return ts.replace(q_targets=new_t)

    def actor_update(ts: DDPGTrainState, batch):
        B, L = batch["rewards"].shape
        flatten = lambda x: x.reshape((B * L,) + x.shape[2:])
        mask = flatten(batch["mask"])
        n_valid = jnp.maximum(mask.sum(), 1.0)

        def actor_loss_fn(av):
            actor, vision = av
            acts = run_actor_seq(actor, vision, batch["obs"], batch["vobs"],
                                 batch["hidden_in0"])
            qv = jax.vmap(lambda pq: q_apply(pq, flatten(batch["priv"]),
                                             flatten(acts)))(ts.qs)
            return -(qv * mask[None, :]).sum() / (n_valid * args.critic_nb)

        loss, grads = jax.value_and_grad(actor_loss_fn)((ts.actor, ts.vision))
        updates, actor_opt = actor_tx.update(grads, ts.actor_opt,
                                             (ts.actor, ts.vision))
        actor, vision = optax.apply_updates((ts.actor, ts.vision), updates)
        return ts.replace(actor=actor, vision=vision, actor_opt=actor_opt,
                          step=ts.step + 1), loss

    def bc_update(ts: DDPGTrainState, batch):
        """Behavior-cloning step on expert demo windows: masked MSE of the
        recurrent student's actions against the expert's recorded actions
        (clipped to the actor's tanh range — the expert PPO mean is
        unbounded, the env torque path is what clips downstream).

        NOT in the reference: DDPG_demos_rnn_vision.py trains the actor
        purely from Q gradients over a ~50x larger env-step budget. Used
        only as a WARM START before the (unchanged, reference-faithful)
        DDPG phase to close that budget gap on TPU wall-clock; documented
        as a deviation in BASELINE.md."""
        mask = batch["mask"][..., None]
        target = jnp.clip(batch["actions"], args.action_low,
                          args.action_high)
        n_valid = jnp.maximum(mask.sum() * target.shape[-1], 1.0)

        def bc_loss_fn(av):
            actor, vision = av
            acts = run_actor_seq(actor, vision, batch["obs"], batch["vobs"],
                                 batch["hidden_in0"])
            return (jnp.square(acts - target) * mask).sum() / n_valid

        loss, grads = jax.value_and_grad(bc_loss_fn)((ts.actor, ts.vision))
        updates, actor_opt = actor_tx.update(grads, ts.actor_opt,
                                             (ts.actor, ts.vision))
        actor, vision = optax.apply_updates((ts.actor, ts.vision), updates)
        return ts.replace(actor=actor, vision=vision,
                          actor_opt=actor_opt), loss

    return actor_tx, q_tx, q_update, target_update, actor_update, bc_update


def generate_demos(expert_policy_fn, env, steps: int, key, args: DDPGArgs,
                   buffer: SeqBuffer | None = None):
    """Fill a demo buffer with an expert policy (DDPG_demos_generate
    :339-431). expert_policy_fn(full_obs (N, obs)) -> actions.

    The env must be a ParkourEnv-like with (world, obs, rew, done_prob,
    info) steps; proprio = obs[:, :45] and depth from make_depth_fn."""
    from ..envs.depth import DepthCameraCfg, make_depth_fn

    if buffer is None:
        buffer = init_buffer(args, env.num_envs, env.num_obs,
                             env.num_actions)
    render = make_depth_fn(env.hf, DepthCameraCfg(
        height=args.vis_hw, width=args.vis_hw), model=env.model)
    world = env.init_state(key)
    obs = env.get_observations(world)
    zero_h = jnp.zeros((env.num_envs, args.rnn_hidden))

    @jax.jit
    def one(world, obs, buffer):
        actions = expert_policy_fn(obs)
        world2, next_obs, rew, done_prob, info = env.step(world, actions)
        vobs = render(world.env.phys.base_pos, world.env.phys.base_quat,
                       world.env.phys.joint_q)
        vobs_u8 = (vobs * 255).astype(jnp.uint8)
        buffer = buffer_add(
            buffer, obs[:, :args.proprio_dim], obs, vobs_u8, actions, rew,
            done_prob, info["true_dones"].astype(jnp.float32), zero_h)
        return world2, next_obs, buffer

    for _ in range(steps):
        world, obs, buffer = one(world, obs, buffer)
    return buffer


def concat_batches(a: dict, b: dict) -> dict:
    """50/50 online/expert batch mixing (DDPG_demos_rnn_vision.py:543-560)."""
    return {k: jnp.concatenate([a[k], b[k]], axis=0) for k in a}


def train_vision_student(env, expert_buffer: SeqBuffer, total_env_steps: int,
                         key, args: DDPGArgs = DDPGArgs(), log_fn=print,
                         log_freq: int = 24, bc_batches: int = 0):
    """The DDPG_demos_rnn_vision main loop (:393-630): online collection
    with the recurrent vision actor + 8 update substeps per env step
    (Q every substep, targets every policy_frequency, actor on the last).

    bc_batches > 0 runs a behavior-cloning warm start on the expert demo
    buffer first (see make_update_fns.bc_update — a documented deviation:
    the reference reaches a traversing student with Q gradients alone by
    spending ~50x more env steps).

    Returns (train_state, online_buffer)."""
    from ..envs.depth import DepthCameraCfg, make_depth_fn

    actor_tx, q_tx, q_update, target_update, actor_update, bc_update = \
        make_update_fns(args)
    k_ts, k_env, key = jax.random.split(key, 3)
    ts = init_train_state(k_ts, env.num_obs, env.num_actions, args,
                          actor_tx, q_tx)

    if bc_batches:
        # ONE batch per dispatch: scanning many BC updates into a single
        # graph produced a pathological server-side compile on the axon
        # terminal; the single-batch graph is actor_update-sized (known
        # fine) and ~20 ms of dispatch per batch is noise here.
        # The demo buffer is an ARGUMENT, not a closure capture — a
        # closed-over device array is baked into the compile request as a
        # constant (a 1.75 GB demo buffer overflowed the remote compiler's
        # request limit, HTTP 413).
        @jax.jit
        def bc_step(ts, buf, key):
            key, k = jax.random.split(key)
            batch = buffer_sample(buf, k, args.batch_size, args.seq_len)
            ts, loss = bc_update(ts, batch)
            return ts, key, loss

        key, k_bc = jax.random.split(key)
        for done_b in range(1, bc_batches + 1):
            ts, k_bc, bc_loss = bc_step(ts, expert_buffer, k_bc)
            if done_b % 500 == 0 or done_b == bc_batches:
                log_fn(f"bc {done_b:5d}/{bc_batches} | "
                       f"bc_loss {float(bc_loss):.4f}")
        # fresh actor optimizer for the DDPG phase: Adam moments fitted to
        # the BC loss (then left stale through the actor-update hold) would
        # otherwise seed the first deterministic-policy-gradient steps
        ts = ts.replace(actor_opt=actor_tx.init((ts.actor, ts.vision)))
    rb = init_buffer(args, env.num_envs, env.num_obs, env.num_actions)
    render = make_depth_fn(env.hf, DepthCameraCfg(height=args.vis_hw,
                                                  width=args.vis_hw),
                           model=env.model)
    world = env.init_state(k_env)
    obs = env.get_observations(world)
    N = env.num_envs
    hidden = jnp.zeros((N, args.rnn_hidden))
    vlat = jnp.zeros((N, args.vision_latent))

    # donate ts/world/rb: the ring alone is ~1.8 GB at 1024 envs x 512
    # steps — an undonated in/out copy of it OOMed the 16 GB chip the
    # first time the update graph's temps landed on top (round 5)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 5))
    def collect(ts, world, obs, hidden, vlat, rb, step, key):
        key, k_expl = jax.random.split(key)
        vobs = render(world.env.phys.base_pos, world.env.phys.base_quat,
                       world.env.phys.joint_q)
        vlat = jnp.where(step % args.vision_update_interval == 0,
                         vision_apply(ts.vision, vobs), vlat)
        proprio = obs[:, :args.proprio_dim]
        a_policy, hidden_out = actor_apply(ts.actor, proprio, vlat, hidden,
                                           args)
        a_random = jax.random.uniform(
            k_expl, a_policy.shape, minval=args.action_low,
            maxval=args.action_high)
        warmup = step * N < args.learning_starts
        actions = jnp.where(warmup, a_random, a_policy)
        hidden_out = jnp.where(warmup, hidden, hidden_out)
        world2, next_obs, rew, done_prob, info = env.step(world, actions)
        td = info["true_dones"].astype(jnp.float32)
        hidden_out = hidden_out * (1.0 - td)[:, None]            # :519-521
        rb = buffer_add(rb, proprio, obs, (vobs * 255).astype(jnp.uint8),
                        actions, rew, done_prob, td, hidden)
        return ts.replace(key=key), world2, next_obs, hidden_out, vlat, rb, \
            jnp.mean(rew)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update_round(ts, rb, expert_buffer, key, actor_on):
        def substep(carry, i):
            ts, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            half = args.batch_size // 2
            online = buffer_sample(rb, k1, half, args.seq_len)
            demo = buffer_sample(expert_buffer, k2, args.batch_size - half,
                                 args.seq_len)
            batch = concat_batches(online, demo)
            ts, q_loss = q_update(ts, batch)
            ts = jax.lax.cond(i % args.policy_frequency == 0,
                              target_update, lambda t: t, ts)
            ts, a_loss = jax.lax.cond(
                (i == args.updates_per_step - 1) & actor_on,
                lambda t: actor_update(t, batch),
                lambda t: (t, jnp.float32(0.0)), ts)
            return (ts, key), (q_loss, a_loss)

        (ts, key), (q_losses, a_losses) = jax.lax.scan(
            substep, (ts, key), jnp.arange(args.updates_per_step))
        return ts, key, jnp.mean(q_losses), a_losses[-1]

    steps = total_env_steps // N
    # After a BC warm start the actor is already competent while the Q
    # ensemble is random — hold actor updates (Q/targets keep training)
    # until the critics have fit the warm-started policy's returns, or the
    # first deterministic-policy gradients would erase the BC solution.
    # 0 = the reference behavior (actor updates from the first round).
    actor_hold = args.actor_delay_env_steps // N if bc_batches else 0
    for step in range(steps):
        ts, world, obs, hidden, vlat, rb, mean_rew = collect(
            ts, world, obs, hidden, vlat, rb, jnp.int32(step), ts.key)
        if (step + 1) * N > args.learning_starts:
            key, k_up = jax.random.split(key)
            ts, _, q_loss, a_loss = update_round(
                ts, rb, expert_buffer, k_up,
                jnp.bool_(step >= actor_hold))
            if step % log_freq == 0:
                log_fn(f"step {step:5d} | rew {float(mean_rew):.3f} | "
                       f"q_loss {float(q_loss):.4f} | "
                       f"actor_loss {float(a_loss):.4f}")
    return ts, rb
