"""Console monitoring tables + profiling hooks.

- monitor_table: fixed-width key/value table printer, the analog of the
  Texttable console monitors (tasks/go2_parkour.py:1487-1600, algos/PPO.py
  monitor():115-143) without the external texttable dependency;
- profile_trace: context manager around jax.profiler for per-phase traces
  (SURVEY.md §5.1 TPU plan — the reference has no profiler hooks at all).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterable, Optional


def monitor_table(rows: Dict[str, float], title: str = "",
                  width: int = 34) -> str:
    """Render {name: value} as the reference's two-column console table."""
    lines = []
    if title:
        lines.append(f"============ {title} ============")
    lines.append(f"{'Element':<{width}} {'Mean Value':>12}")
    lines.append("-" * (width + 13))
    for k, v in rows.items():
        try:
            lines.append(f"{k:<{width}} {float(v):>12.4f}")
        except (TypeError, ValueError):
            lines.append(f"{k:<{width}} {str(v):>12}")
    return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into log_dir (None = no-op). View with
    TensorBoard's profile plugin or xprof."""
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase accounting (the reference splits collection_time /
    learn_time per iteration, ppo_cse/__init__.py:136-206)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._t0 = None
        self._phase = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) \
                + (time.time() - t0)

    def summary(self) -> Dict[str, float]:
        out = dict(self.totals)
        self.totals = {}
        return out
