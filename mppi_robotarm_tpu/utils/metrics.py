"""Structured per-step metrics and observability (SURVEY.md §5.5).

The reference's only observability is print statements (run.py:60-61,
control.py:227-229) and matplotlib figures.  Here: solver-health metrics
computed from SolveResult / SimRecord arrays, an on-device NaN guard, and a
host logger with configurable cadence.
"""

from __future__ import annotations

import json
import sys
from typing import Optional, TextIO

import numpy as np
import jax.numpy as jnp

from ..ops.weights import effective_sample_size, weight_entropy


def solve_metrics(costs: jnp.ndarray, weights: jnp.ndarray) -> dict:
    """Scalar health metrics of one solve (cost stats, ESS, entropy)."""
    return {
        "cost_min": float(jnp.min(costs)),
        "cost_mean": float(jnp.mean(costs)),
        "cost_max": float(jnp.max(costs)),
        "ess": float(effective_sample_size(weights)),
        "weight_entropy": float(weight_entropy(weights)),
    }


def tracking_errors(ee: np.ndarray, ref_xy: np.ndarray,
                    full_path: Optional[np.ndarray] = None) -> dict:
    """Closed-loop end-effector tracking error stats.

    ``ee``/``ref_xy``: (steps, 2).  The primary metrics are the reference's
    step-aligned error (vs ref_path[k], run.py:65-68) — which penalises lag
    along the path.  When ``full_path`` (N, >=2) is given, the lag-free
    distance to the nearest path point is reported too ("on-path" error).
    """
    ee = np.asarray(ee)
    ref_xy = np.asarray(ref_xy)
    err = np.linalg.norm(ee - ref_xy, axis=1)
    out = {
        "ee_rms_m": float(np.sqrt(np.mean(err ** 2))),
        "ee_mean_m": float(err.mean()),
        "ee_max_m": float(err.max()),
        "ee_final_m": float(err[-1]),
    }
    if full_path is not None:
        p = np.asarray(full_path)[:, 0:2]
        d = np.linalg.norm(ee[:, None, :] - p[None], axis=2).min(axis=1)
        out["onpath_mean_m"] = float(d.mean())
        out["onpath_max_m"] = float(d.max())
    return out


def nan_guard(*arrays) -> bool:
    """True when every array is finite — debug-mode solver check (§5.2)."""
    return all(bool(jnp.all(jnp.isfinite(a))) for a in arrays)


class MetricsLogger:
    """JSON-lines metrics sink with step cadence (host side, post-scan)."""

    def __init__(self, stream: Optional[TextIO] = None, every: int = 1):
        self.stream = stream or sys.stderr
        self.every = max(1, every)

    def log(self, step: int, **metrics) -> None:
        if step % self.every:
            return
        self.stream.write(json.dumps({"step": step, **metrics}) + "\n")

    def log_record(self, rec, stride: int = 100) -> None:
        """Dump a SimRecord's solver-health series at ``stride`` cadence."""
        n = np.asarray(rec.cost_min).shape[0]
        for i in range(0, n, stride):
            self.log(i, cost_min=float(rec.cost_min[i]),
                     cost_mean=float(rec.cost_mean[i]),
                     ess=float(rec.ess[i]),
                     weight_entropy=float(rec.weight_entropy[i]),
                     wp_idx=int(rec.wp_idx[i]))
