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


def _apply_mlp(layers, x, activation):
    act = _act(activation)
    for i, lyr in enumerate(layers):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(layers) - 1:
            x = act(x)
    return x


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
    return _apply_mlp(params["adaptation"], obs_history, args.activation)


def actor_mean(params, obs_history, latent, args: ACArgs = ACArgs()):
    x = jnp.concatenate([obs_history, latent], axis=-1)
    return _apply_mlp(params["actor"], x, args.activation)


def act_student(params, obs_history, args: ACArgs = ACArgs()):
    """Deployment-path inference (actor_critic.py:131-135)."""
    latent = adaptation_module(params, obs_history, args)
    return actor_mean(params, obs_history, latent, args), latent


def act_teacher(params, obs_history, privileged_obs, args: ACArgs = ACArgs()):
    return actor_mean(params, obs_history, privileged_obs, args)


def evaluate(params, obs_history, privileged_obs, args: ACArgs = ACArgs()):
    x = jnp.concatenate([obs_history, privileged_obs], axis=-1)
    return _apply_mlp(params["critic"], x, args.activation)[..., 0]


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
