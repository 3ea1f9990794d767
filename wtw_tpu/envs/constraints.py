"""Constraints-as-Terminations (CaT) machinery.

Re-design of the reference's ConstraintManager
(utils/constraint_manager.py:3-121) as pure functions over explicit state so
it lives inside the jitted env step:

- each constraint is a (N, w) violation array (w columns, e.g. one per
  joint); per COLUMN a Polyak running max of the batch-max violation
  (tau=0.95, :52-54);
- termination probability per element: 0 where no violation, else
  min_p + clip(violation / running_max, 0, 1) * (max_p - min_p) (:63-70);
- per-env probability = max over all constraints' columns (:73-77).

Constraints are declared once (name, width, max_p is traced so the soft_p
curriculum works); the state is a single flat (total_cols,) running-max
vector.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CaTState:
    running_max: jnp.ndarray    # (total_cols,)


class CaTManager:
    """Static declaration of the constraint battery. Pure methods."""

    def __init__(self, names_widths: Sequence[Tuple[str, int]],
                 tau: float = 0.95, min_p: float = 0.0,
                 axis_name: str | None = None):
        self.names = [n for n, _ in names_widths]
        self.widths = [w for _, w in names_widths]
        self.offsets = {}
        off = 0
        for n, w in names_widths:
            self.offsets[n] = (off, off + w)
            off += w
        self.total = off
        self.tau = tau
        self.min_p = min_p
        self.axis_name = axis_name

    def init_state(self) -> CaTState:
        return CaTState(running_max=jnp.full((self.total,), 1e-6, jnp.float32))

    def step(self, state: CaTState,
             constraints: Dict[str, jnp.ndarray],
             max_ps: Dict[str, jnp.ndarray]):
        """One step: updates running maxes, returns
        (new_state, probs (N,), per_constraint_violation_frac dict).

        constraints[name]: (N,) or (N, w) violation values (>0 = violated).
        max_ps[name]: scalar max termination probability (traced ok).
        """
        assert set(constraints) == set(self.names), (
            f"declared {self.names}, got {list(constraints)}")
        cols = []
        for n in self.names:
            c = constraints[n]
            if c.ndim == 1:
                c = c[:, None]
            cols.append(c.astype(jnp.float32))
        allc = jnp.concatenate(cols, axis=1)                  # (N, total)

        batch_max = jnp.clip(jnp.max(allc, axis=0), min=1e-6)  # (total,)
        if self.axis_name is not None:
            batch_max = jax.lax.pmax(batch_max, self.axis_name)
        new_rm = self.tau * state.running_max + (1 - self.tau) * batch_max

        maxp_vec = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(max_ps[n], jnp.float32), (w,))
            for n, w in zip(self.names, self.widths)])         # (total,)
        scaled = jnp.clip(allc / new_rm[None, :], 0.0, 1.0)
        probs = jnp.where(allc > 0.0,
                          self.min_p + scaled * (maxp_vec - self.min_p)[None, :],
                          0.0)                                 # (N, total)
        env_prob = jnp.max(probs, axis=1)                      # (N,)
        # per-env column of the binding constraint (diagnostics; offsets
        # map it back to a constraint name)
        env_argmax_col = jnp.argmax(probs, axis=1)             # (N,)

        # violation fraction per constraint (ConstraintManager.log_all /
        # get_vals :104-121): fraction of envs with any violated column
        viol = {}
        for n in self.names:
            a, b = self.offsets[n]
            viol[n] = jnp.mean((jnp.max(probs[:, a:b], axis=1) > 0.0)
                               .astype(jnp.float32))
            if self.axis_name is not None:
                # global violation fraction (shards hold equal env counts)
                viol[n] = jax.lax.pmean(viol[n], self.axis_name)
        return CaTState(running_max=new_rm), env_prob, viol, env_argmax_col


def sqrt_func(x: jnp.ndarray) -> jnp.ndarray:
    """The reference wraps many constraints in `sqrt_func`, which is defined
    as a PASS-THROUGH (`return x`, go2_parkour.py:17-19 — the sqrt variant is
    commented out). Kept as a named hook for parity and experimentation."""
    return x
