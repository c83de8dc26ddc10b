"""Seeded NumPy oracle of the reference MPPI semantics (SURVEY.md §4.1).

A fresh float64 reimplementation of junofficial/mppi_RobotArm's algorithm
(control.py:67-152 + run.py:48-71) used as the golden model for parity tests.
It is NOT a copy of the reference: it is vectorised over the sample axis and
takes injected noise (the reference uses the unseeded global NumPy RNG,
quirk Q8).  All behavioural quirks Q1-Q7 and Q9-Q11 are preserved; the
median filter calls ``scipy.ndimage.median_filter`` itself so that edge
semantics are exact by construction.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import median_filter

# Physical constants (reference sys_params.py:1-13).
M1, M2, L1, L2, LC1, LC2, GRAV = 1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 9.81


def oracle_ddq(q1, q2, dq1, dq2, u1, u2):
    """Vectorised arm dynamics (utils.py:14-29 / control.py:241-252, quirk Q1)."""
    c2 = np.cos(q2)
    m11 = M1 * LC1 ** 2 + L1 + M2 * (L1 ** 2 + LC2 ** 2 + 2 * L1 * LC2 * c2) + L2
    m12 = M2 * L1 * LC2 * c2 + M2 * LC2 ** 2 + L2
    m22 = M2 * LC2 ** 2 + L2
    h = M2 * L1 * LC2 * np.sin(q2)
    g1 = M1 * LC1 * GRAV * np.cos(q1) + M2 * GRAV * (
        LC2 * np.cos(q1 + q2) + L1 * np.cos(q1))
    g2 = M2 * LC2 * GRAV * np.cos(q1 + q2)
    cdq1 = -h * dq2 * dq1 + (-h * dq1 - h * dq2) * dq2
    cdq2 = h * dq1 * dq1
    r1 = u1 - cdq1 - g1
    r2 = u2 - cdq2 - g2
    det = m11 * m22 - m12 * m12
    ddq1 = (m22 * r1 - m12 * r2) / det
    ddq2 = (-m12 * r1 + m11 * r2) / det
    return ddq1, ddq2


def oracle_step(x, u, dt):
    """Semi-implicit Euler controller-model step `_F` (control.py:256-259).

    x: (..., 4), u: (..., 2) -> (..., 4).
    """
    q1, q2, dq1, dq2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    ddq1, ddq2 = oracle_ddq(q1, q2, dq1, dq2, u[..., 0], u[..., 1])
    dq1 = dq1 + ddq1 * dt
    dq2 = dq2 + ddq2 * dt
    q1 = q1 + dq1 * dt
    q2 = q2 + dq2 * dt
    return np.stack([q1, q2, dq1, dq2], axis=-1)


def oracle_fk(q1, q2):
    """End-effector FK with l1=l2=1 (control.py:178-179)."""
    return np.cos(q1) + np.cos(q1 + q2), np.sin(q1) + np.sin(q1 + q2)


class OracleMPPI:
    """Stateful oracle controller mirroring MPPIControllerForPathTracking."""

    SEARCH_IDX_LEN = 30  # control.py:203

    def __init__(self, ref_path, horizon=30, num_samples=100,
                 exploration=0.0, lam=100.0, alpha=0.98,
                 sigma=((20.0, 0.0), (0.0, 20.0)),
                 stage_w=(0.5, 0.5, 5.0, 5.0),
                 terminal_w=(5.0, 5.0, 50.0, 50.0),
                 delta_t=0.006, warm_start=(10.0, -2.0),
                 filter_window=10):
        self.ref_path = np.asarray(ref_path, dtype=np.float64)
        self.T = horizon
        self.K = num_samples
        self.exploration = exploration
        self.lam = lam
        self.gamma = lam * (1.0 - alpha)            # control.py:45
        self.sigma = np.asarray(sigma, dtype=np.float64)
        self.sigma_inv = np.linalg.inv(self.sigma)
        self.stage_w = np.asarray(stage_w, dtype=np.float64)
        self.terminal_w = np.asarray(terminal_w, dtype=np.float64)
        self.delta_t = delta_t
        self.filter_window = filter_window
        self.u_prev = np.tile(np.asarray(warm_start, np.float64), (self.T, 1))
        self.prev_idx = 0                            # control.py:65

    # -- windowed nearest-waypoint search (control.py:200-232, Q5) ----------
    def nearest(self, q1, q2, update=False):
        x, y = oracle_fk(np.asarray(q1), np.asarray(q2))
        win = self.ref_path[self.prev_idx:self.prev_idx + self.SEARCH_IDX_LEN]
        d = ((x[..., None] - win[:, 0]) ** 2
             + (y[..., None] - win[:, 1]) ** 2) * 100.0    # control.py:212
        off = np.argmin(d, axis=-1)
        idx = self.prev_idx + off
        if update:
            self.prev_idx = int(idx)                 # scalar call site
        ref = self.ref_path[idx]
        return idx, ref[..., 0], ref[..., 1], ref[..., 2], ref[..., 3]

    def _cost(self, x, weights):
        """Stage/terminal tracking cost ×10000 (control.py:174-198, Q7)."""
        q1, q2, dq1, dq2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        ex, ey = oracle_fk(q1, q2)
        _, rx, ry, rdq1, rdq2 = self.nearest(q1, q2)
        c = (weights[0] * (ex - rx) ** 2 + weights[1] * (ey - ry) ** 2
             + weights[2] * (dq1 - rdq1) ** 2 + weights[3] * (dq2 - rdq2) ** 2)
        return c * 10000.0

    # -- the solve (control.py:67-152) --------------------------------------
    def solve(self, observed_x, eps):
        """One MPPI solve with injected noise eps (K, T, 2).

        Returns (u0, u_seq, S, w).  Mutates u_prev / prev_idx exactly like
        the reference (net Q3 semantics).  Because the reference's in-place
        warm-start shift (control.py:148-149) precedes ``return u[0]``
        (control.py:152) on the ALIASED array, the returned u0 is the
        shifted first element — ``u_new[1]`` for T ≥ 2.
        """
        x0 = np.asarray(observed_x, dtype=np.float64)
        self.nearest(x0[0], x0[1], update=True)      # control.py:75
        if self.prev_idx >= self.ref_path.shape[0] - 1:
            raise IndexError("Reached the end of the reference path.")

        eps = np.asarray(eps, dtype=np.float64)
        u = self.u_prev
        exploit = np.arange(self.K) < (1.0 - self.exploration) * self.K
        x = np.broadcast_to(x0, (self.K, 4)).copy()
        S = np.zeros(self.K)
        for t in range(1, self.T + 1):
            v_t = np.where(exploit[:, None], u[t - 1] + eps[:, t - 1],
                           eps[:, t - 1])
            x = oracle_step(x, v_t, self.delta_t)
            S += self._cost(x, self.stage_w)
            S += self.gamma * v_t @ (self.sigma_inv @ u[t - 1])
        S += self._cost(x, self.terminal_w)

        # stabilised softmax weights (control.py:297-314)
        rho = S.min()
        e = np.exp(-(S - rho) / self.lam)
        w = e / e.sum()

        w_eps = np.einsum("k,ktu->tu", w, eps)       # control.py:115-118
        w_eps = np.stack(
            [median_filter(w_eps[:, d], size=self.filter_window,
                           mode="reflect") for d in range(2)], axis=1)
        u_new = u + w_eps                            # control.py:126 (Q3)
        # shift happens BEFORE the return on the aliased array
        # (control.py:148-152): the applied control is the shifted [0].
        self.u_prev = np.concatenate([u_new[1:], u_new[-1:]], axis=0)
        return self.u_prev[0].copy(), u_new.copy(), S, w


def oracle_plant_step(q, dq, u, dt):
    """Plant integration (run.py:53-55): dq += dt·ddq, q += dt·dq_new."""
    ddq1, ddq2 = oracle_ddq(q[0], q[1], dq[0], dq[1], u[0], u[1])
    dq = dq + dt * np.array([ddq1, ddq2])
    q = q + dt * dq
    return q, dq


def oracle_closed_loop(ctrl: OracleMPPI, q0, dq0, dt, num_steps, eps_list):
    """Reference closed loop (run.py:48-71) with injected per-step noise."""
    q = np.asarray(q0, np.float64).copy()
    dq = np.asarray(dq0, np.float64).copy()
    recs = []
    for i in range(num_steps):
        state = np.concatenate([q, dq])
        u0, _, _, _ = ctrl.solve(state, eps_list[i])
        q, dq = oracle_plant_step(q, dq, u0, dt)
        recs.append((q.copy(), dq.copy(), u0.copy(), ctrl.prev_idx))
    return recs
