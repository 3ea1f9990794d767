"""Walk-These-Ways actor-critic with concurrent-state-estimation adaptation
module.

Re-design of go1_gym_learn/ppo_cse/actor_critic.py:19-147 as parameter
pytrees + pure apply functions:

- adaptation module: obs_history -> predicted privileged obs
  (hidden [256, 128], ELU; AC_Args :14)
- actor: [obs_history, latent] -> action mean (hidden [512, 256, 128]; :55-65)
- critic: [obs_history, privileged_obs] -> value (:69-77)
- learned per-dim log-free std parameter (init 1.0; :84)

Initialization matches torch.nn.Linear defaults (uniform ±1/sqrt(fan_in))
so learning dynamics start from the same distribution as the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ACArgs:
    init_noise_std: float = 1.0
    actor_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    critic_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    adaptation_hidden_dims: Tuple[int, ...] = (256, 128)
    activation: str = "elu"
    # Matmul compute dtype. "bfloat16" runs every layer's GEMM with bf16
    # inputs and fp32 MXU accumulation — parameters, biases (as stored),
    # the optimizer, and each tower's OUTPUT stay fp32, while HIDDEN
    # activations are PRODUCED in bf16 by the GEMM epilogue
    # (preferred_element_type=bf16; bias add + ELU then run in bf16), so
    # the (batch, 512) pre/post-activation tensors and their ELU
    # forward/backward ride HBM at half width and no f32 intermediate is
    # ever materialized. On TPU this halves the traffic of the dominant
    # (batch, 2100)-input GEMMs and doubles the MXU rate; the reference
    # trains the same math in torch fp32 (actor_critic.py:19-147), so this
    # is opt-in (default fp32).
    compute_dtype: str = "float32"


def _act(name):
    return {"elu": jax.nn.elu, "relu": jax.nn.relu, "tanh": jnp.tanh,
            "selu": jax.nn.selu, "lrelu": jax.nn.leaky_relu,
            "sigmoid": jax.nn.sigmoid}[name]


def _init_mlp(key, sizes):
    params = []
    for i in range(len(sizes) - 1):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(sizes[i])
        params.append({
            "w": jax.random.uniform(kw, (sizes[i], sizes[i + 1]),
                                    minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (sizes[i + 1],),
                                    minval=-bound, maxval=bound),
        })
    return params


def _matmul(x, w, dtype, out_dtype=None):
    """GEMM with `dtype` inputs, f32 MXU accumulation, and `out_dtype`
    results (None = f32). Rounding the HIDDEN-layer outputs straight to
    bf16 in the GEMM epilogue matters: with a f32 preferred type, XLA
    materializes the (batch, 512) f32 product to HBM and re-reads it for
    the bias+ELU+cast fusion AND the ELU' backward — measured 11.7 ms of a
    76 ms train iteration at 4096 envs (profile r4). Tower OUTPUTS stay
    f32 in every mode."""
    if dtype == "float32":
        return x.astype(jnp.float32) @ w
    dt = jnp.dtype(dtype)
    return jax.lax.dot_general(
        x.astype(dt), w.astype(dt), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.dtype(out_dtype or jnp.float32))


def _apply_tail(layers, x, activation, dtype, hid):
    """Apply layers[1:] to the (already activated) first-layer output."""
    for i, lyr in enumerate(layers[1:], start=1):
        last = i == len(layers) - 1
        o = None if (last or hid is None) else hid
        b = lyr["b"] if o is None else lyr["b"].astype(o)
        x = _matmul(x, lyr["w"], dtype, o) + b
        if not last:
            x = _act(activation)(x)
    return x


def _apply_mlp(layers, x, activation, dtype="float32"):
    hid = None if dtype == "float32" else jnp.dtype(dtype)
    for i, lyr in enumerate(layers):
        last = i == len(layers) - 1
        o = None if (last or hid is None) else hid
        b = lyr["b"] if o is None else lyr["b"].astype(o)
        x = _matmul(x, lyr["w"], dtype, o) + b
        if not last:
            x = _act(activation)(x)
    return x


def _apply_mlp_parts(layers, parts, activation, dtype="float32"):
    """_apply_mlp where the input is a CONCAT of `parts` along the last
    axis, with the first layer computed as a sum of per-part GEMMs against
    static row-slices of W — the (batch, 2100+latent) concat buffer never
    materializes in HBM (it would be read-write traffic comparable to the
    GEMM itself at 4096x24 samples).

    Note: in bf16 mode each per-part GEMM epilogue rounds to bf16 before
    the cross-part add, so the first-layer partial sums accumulate in bf16
    (a slight precision loss vs one fused f32 accumulation; covered by the
    0.05-tol parity tests — keep the part-sum in f32 and round once before
    the activation if bf16 training quality ever drifts)."""
    hid = (None if dtype == "float32" or len(layers) == 1
           else jnp.dtype(dtype))
    w0 = layers[0]["w"]
    b0 = layers[0]["b"] if hid is None else layers[0]["b"].astype(hid)
    off, x = 0, b0
    for p in parts:
        d = p.shape[-1]
        x = x + _matmul(p, w0[off:off + d], dtype, hid)
        off += d
    assert off == w0.shape[0], (off, w0.shape)
    if len(layers) > 1:
        x = _act(activation)(x)
    return _apply_tail(layers, x, activation, dtype, hid)


def init_actor_critic(key: jax.Array, num_obs: int, num_privileged_obs: int,
                      num_obs_history: int, num_actions: int,
                      args: ACArgs = ACArgs()) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "adaptation": _init_mlp(
            k1, (num_obs_history,) + args.adaptation_hidden_dims
            + (num_privileged_obs,)),
        "actor": _init_mlp(
            k2, (num_privileged_obs + num_obs_history,)
            + args.actor_hidden_dims + (num_actions,)),
        "critic": _init_mlp(
            k3, (num_privileged_obs + num_obs_history,)
            + args.critic_hidden_dims + (1,)),
        "std": args.init_noise_std * jnp.ones(num_actions),
    }


def adaptation_module(params, obs_history, args: ACArgs = ACArgs()):
    return _apply_mlp(params["adaptation"], obs_history, args.activation,
                      args.compute_dtype)


def actor_mean(params, obs_history, latent, args: ACArgs = ACArgs()):
    return _apply_mlp_parts(params["actor"], [obs_history, latent],
                            args.activation, args.compute_dtype)


def actor_critic_heads(params, obs_history, latent, privileged_obs,
                       args: ACArgs = ACArgs()):
    """(actor mean, value) with the actor's and critic's first-layer GEMMs
    over the SHARED obs_history input computed as ONE concatenated GEMM
    (2100 x (512+512)) — bitwise identical per output column to the two
    separate GEMMs, but one MXU pass in both the forward and the dW
    backward. The small latent/privileged first-layer parts stay separate
    (they need their own gradients)."""
    a, c = params["actor"], params["critic"]
    dtype = args.compute_dtype
    hid = None if dtype == "float32" else jnp.dtype(dtype)
    cast = (lambda b: b) if hid is None else (lambda b: b.astype(hid))
    H = obs_history.shape[-1]
    w_cat = jnp.concatenate([a[0]["w"][:H], c[0]["w"][:H]], axis=1)
    y = _matmul(obs_history, w_cat, dtype, hid)
    da = a[0]["w"].shape[1]
    y_a = y[..., :da] + cast(a[0]["b"]) + _matmul(latent, a[0]["w"][H:],
                                                  dtype, hid)
    y_c = y[..., da:] + cast(c[0]["b"]) + _matmul(privileged_obs,
                                                  c[0]["w"][H:], dtype, hid)
    za = _apply_tail(a, _act(args.activation)(y_a), args.activation,
                     dtype, hid)
    zc = _apply_tail(c, _act(args.activation)(y_c), args.activation,
                     dtype, hid)
    return za, zc[..., 0]


def act_student(params, obs_history, args: ACArgs = ACArgs()):
    """Deployment-path inference (actor_critic.py:131-135)."""
    latent = adaptation_module(params, obs_history, args)
    return actor_mean(params, obs_history, latent, args), latent


def act_teacher(params, obs_history, privileged_obs, args: ACArgs = ACArgs()):
    return actor_mean(params, obs_history, privileged_obs, args)


def evaluate(params, obs_history, privileged_obs, args: ACArgs = ACArgs()):
    return _apply_mlp_parts(params["critic"], [obs_history, privileged_obs],
                            args.activation, args.compute_dtype)[..., 0]


def distribution(params, obs_history, args: ACArgs = ACArgs()):
    """(mean, std) of the Gaussian policy (update_distribution :113-116)."""
    mean, _ = act_student(params, obs_history, args)
    std = jnp.broadcast_to(params["std"], mean.shape)
    return mean, std


def sample_actions(key, mean, std):
    return mean + std * jax.random.normal(key, mean.shape)


def log_prob(mean, std, actions):
    var = std ** 2
    lp = -0.5 * ((actions - mean) ** 2 / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(lp, axis=-1)


def entropy(std):
    return jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * std ** 2), axis=-1)
