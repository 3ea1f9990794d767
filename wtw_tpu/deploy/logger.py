"""Deployment episode logger.

The analog of go1_gym_deploy/utils/logger.py (MultiLogger): accumulate
timestamped robot telemetry during a deployment session and dump pkl
episodes for offline analysis / actuator-net retraining (the training
pipeline consumes exactly these logs, learn/actuator_train.build_features).
"""
from __future__ import annotations

import os
import pickle
import time
from collections import defaultdict

import numpy as np


class EpisodeLogger:
    def __init__(self, run_dir: str = "deploy_logs"):
        self.run_dir = run_dir
        self.reset()

    def reset(self):
        self._data = defaultdict(list)
        self._t0 = time.time()

    def log(self, **key_vals):
        """Append one control tick of named arrays/scalars."""
        self._data["t"].append(time.time() - self._t0)
        for k, v in key_vals.items():
            self._data[k].append(np.asarray(v))

    def save(self, tag: str | None = None) -> str:
        os.makedirs(self.run_dir, exist_ok=True)
        tag = tag or time.strftime("%Y%m%d_%H%M%S")
        path = os.path.join(self.run_dir, f"episode_{tag}.pkl")
        blob = {k: np.stack(v) if np.asarray(v[0]).ndim else np.asarray(v)
                for k, v in self._data.items() if v}
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        self.reset()
        return path


def load_episode(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
