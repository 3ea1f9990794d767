"""Deployment policy: numpy inference from exported weights.

The training Runner exports policy weights as a flat .npz
(learn/runner.py save(): adaptation/w{i}, actor/w{i}, ...), replacing the
reference's TorchScript .jit exports (ppo_cse/__init__.py:240-251,
consumed at deploy_policy.py:55-67). On the robot there is no JAX/TPU, so
inference is plain numpy (the nets are 3-layer MLPs — microseconds on CPU).
"""
from __future__ import annotations

import numpy as np


def _elu(x):
    return np.where(x > 0, x, np.expm1(x))


class DeployedPolicy:
    """Student policy: obs_history -> [adaptation latent] -> actions
    (the reference's load_policy closure, deploy_policy.py:14-26)."""

    def __init__(self, npz_path: str):
        raw = np.load(npz_path)
        self.adaptation = self._collect(raw, "adaptation")
        self.actor = self._collect(raw, "actor")

    @staticmethod
    def _collect(raw, prefix):
        layers = []
        i = 0
        while f"{prefix}/w{i}" in raw:
            layers.append((raw[f"{prefix}/w{i}"], raw[f"{prefix}/b{i}"]))
            i += 1
        assert layers, f"no {prefix}/* arrays in checkpoint"
        return layers

    @staticmethod
    def _mlp(layers, x):
        for i, (w, b) in enumerate(layers):
            x = x @ w + b
            if i < len(layers) - 1:
                x = _elu(x)
        return x

    def __call__(self, obs_history: np.ndarray) -> np.ndarray:
        """obs_history: (H*num_obs,) or (B, H*num_obs) -> actions."""
        latent = self._mlp(self.adaptation, obs_history)
        return self._mlp(self.actor,
                         np.concatenate([obs_history, latent], axis=-1))

    def latent(self, obs_history: np.ndarray) -> np.ndarray:
        return self._mlp(self.adaptation, obs_history)
