"""Reference-path loading and synthesis.

The reference ships whitespace-separated text paths (SURVEY.md C24-C26):
  * ``xydq_circle.txt`` — 2000×6 [x, y, dq1, dq2, u1, u2] circle path
    (centre (0.8, 0.8), r=0.6), loaded by run.py:18-19 as columns 0:4;
  * ``xydq.txt`` — 2000×4 [x, y, dq1, dq2];
  * ``trajectory.txt`` / ``trajectory1.txt`` — [q1, q2, x, y] logs.

The loader accepts both 4- and 6-column formats and always returns the
(N, 4) [x, y, dq1, dq2] slice the controller consumes.  The circle generator
re-synthesises the reference path analytically from the IK (utils.py:41-62)
so the framework is self-contained without the data files.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.arm import ik_circle


def load_ref_path(path: str, dtype=np.float32) -> np.ndarray:
    """Load a 4- or 6-column whitespace path file → (N, 4) [x, y, dq1, dq2].

    Mirrors ``np.loadtxt(...)[:, 0:4]`` (run.py:18-19).  6-column files carry
    two extra torque columns (xydq_circle.txt cols 4-5) which are dropped,
    exactly as the reference does.
    """
    raw = np.loadtxt(path)
    if raw.ndim != 2 or raw.shape[1] not in (4, 6):
        raise ValueError(
            f"expected a (N,4) or (N,6) path file, got shape {raw.shape}"
        )
    return np.ascontiguousarray(raw[:, 0:4], dtype=dtype)


def load_joint_log(path: str, dtype=np.float32) -> np.ndarray:
    """Load a [q1, q2, x, y] trajectory log (trajectory.txt format)."""
    raw = np.loadtxt(path)
    if raw.ndim != 2 or raw.shape[1] != 4:
        raise ValueError(f"expected a (N,4) log file, got shape {raw.shape}")
    return np.ascontiguousarray(raw, dtype=dtype)


def ref_path_from_joint_log(log: np.ndarray, dt: float = 0.003,
                            dtype=np.float32) -> np.ndarray:
    """Convert a [q1, q2, x, y] joint log (trajectory.txt format, C26) into
    the controller's (N, 4) [x, y, dq1, dq2] reference-path format.

    Joint velocities come from central differences of the logged joint
    angles at the plant timestep — the same relationship the xydq files'
    velocity columns bear to their paths (BASELINE config 1: "single MPPI
    solve tracking trajectory.txt").
    """
    log = np.asarray(log, dtype=np.float64)
    if log.ndim != 2 or log.shape[1] != 4:
        raise ValueError(f"expected a (N,4) [q1,q2,x,y] log, got {log.shape}")
    dq = np.gradient(log[:, 0:2], axis=0) / dt
    out = np.concatenate([log[:, 2:4], dq], axis=1)
    return np.ascontiguousarray(out, dtype=dtype)


def synth_circle_path(
    num_waypoints: int = 2000,
    revolutions: float = 1.0,
    dt: float = 0.003,
    dtype=np.float32,
) -> np.ndarray:
    """Synthesise an (N, 4) circle reference path from the IK generator.

    XE/YE from utils.py:45-46; joint-velocity references from the finite
    difference of the IK joint targets (the reference's path-generation
    pipeline, SURVEY.md §3.5).
    """
    theta = np.linspace(0.0, 2.0 * np.pi * revolutions, num_waypoints,
                        endpoint=False)
    # the reference's θ≈2π closure overrides are a single-revolution quirk
    # (utils.py:47-52); beyond one revolution they'd pin the path at the
    # singular (2, 0) pose, so multi-revolution paths use the pure circle
    r, xe, ye = ik_circle(jnp.asarray(theta),
                          closure_overrides=revolutions <= 1.0)
    r = np.asarray(r)
    dq = np.gradient(r, axis=0) / dt
    out = np.stack([np.asarray(xe), np.asarray(ye), dq[:, 0], dq[:, 1]],
                   axis=1)
    return np.ascontiguousarray(out, dtype=dtype)
