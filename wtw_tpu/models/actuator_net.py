"""Learned actuator network: per-joint torque model.

The reference ships TorchScript MLPs (resources/actuator_nets/unitree_go1.pt,
loaded at legged_robot.py:1238-1253) with architecture 6->32->32->1 and
softsign activations (scripts/actuator_net/utils.py:91): inputs are
(pos_err, pos_err@t-1, pos_err@t-2, vel, vel@t-1, vel@t-2) per joint.

Here the net is a plain parameter pytree; `tools/convert_actuator_net.py`
extracts the weights from the reference TorchScript files into .npz, and
`wtw_tpu/learn/actuator_train.py` can train new ones from robot logs
(reference: scripts/actuator_net/train.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

HIDDEN = (32, 32)


def init_actuator_net(key: jax.Array, hidden=HIDDEN) -> Dict[str, Any]:
    sizes = (6,) + tuple(hidden) + (1,)
    params = {}
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        bound = 1.0 / np.sqrt(sizes[i])
        params[f"w{i}"] = jax.random.uniform(
            k, (sizes[i], sizes[i + 1]), minval=-bound, maxval=bound)
        params[f"b{i}"] = jnp.zeros(sizes[i + 1])
    return params


def load_actuator_net(name_or_path: str) -> Dict[str, Any]:
    """Load converted weights (.npz with w0,b0,w1,b1,w2,b2)."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(_DATA_DIR, f"{name_or_path}.npz")
    raw = np.load(path)
    return {k: jnp.asarray(raw[k], jnp.float32) for k in raw.files}


def softsign(x):
    return x / (1.0 + jnp.abs(x))


def apply_actuator_net(params, pos_err, pos_err_last, pos_err_last_last,
                       vel, vel_last, vel_last_last) -> jnp.ndarray:
    """Evaluate the torque model for all joints at once.

    Inputs are (nj,) arrays; the net runs per joint on the 6-feature vector
    (legged_robot.py:1242-1251). Returns (nj,) torques.
    """
    x = jnp.stack([pos_err, pos_err_last, pos_err_last_last,
                   vel, vel_last, vel_last_last], axis=-1)    # (nj, 6)
    n_layers = len(params) // 2
    for i in range(n_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            x = softsign(x)
    return x[..., 0]
