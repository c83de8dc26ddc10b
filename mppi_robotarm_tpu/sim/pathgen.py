"""Reference-path generation via the legacy control pipeline (SURVEY.md §3.5).

The reference's data files (xydq_circle.txt 6-col format: [x, y, dq1, dq2,
u1, u2]) were produced by its legacy computed-torque pipeline: IK circle
targets (utils.py:41-62) → outer-loop PD (utils.py:87-93) → feedback
linearization torque (utils.py:65-84) → plant integration.  This module
re-creates that pipeline as a scan-compiled closed loop so the framework can
synthesise its own reference paths in the exact on-disk format — no data
files required.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ArmParams
from ..models.arm import (
    arm_ddq,
    feedback_linearization,
    fk_ee,
    ik_circle,
    pd_outer_loop,
)


@partial(jax.jit, static_argnames=("arm", "num_steps"))
def generate_circle_path(
    arm: ArmParams,
    num_steps: int = 2000,
    dt: float = 0.003,
    theta_rate: float = 2.0 * np.pi / 6.0,   # rad/s around the circle
    kp: float = 100.0,
    kd: float = 20.0,
):
    """Closed-loop legacy tracking run → (num_steps, 6) [x, y, dq1, dq2, u1, u2].

    The plant starts at the IK solution of θ=0 — the (1.4, 0.8) circle start,
    matching the reference's initial joint state (run.py:14 ≈ trajectory.txt
    row 0) — and tracks the IK joint targets with the PD + computed-torque
    law.  Reference derivatives dr/ddr come from jax.jacfwd of the IK, scaled
    by the (constant) θ rate.
    """
    ik_r = lambda th: ik_circle(th)[0]
    ik_dr = jax.jacfwd(ik_r)
    ik_ddr = jax.jacfwd(ik_dr)

    q0 = ik_r(jnp.float32(0.0))
    dq0 = jnp.zeros(2, q0.dtype)

    def body(carry, k):
        q, dq = carry
        theta = theta_rate * dt * k.astype(q.dtype)
        r = ik_r(theta)
        dr = ik_dr(theta) * theta_rate
        ddr = ik_ddr(theta) * theta_rate ** 2
        v = pd_outer_loop(q, dq, r, dr, ddr, kp=kp, kd=kd)
        u1, u2 = feedback_linearization(q[0], q[1], dq[0], dq[1], v[0], v[1],
                                        arm)
        ddq1, ddq2 = arm_ddq(q[0], q[1], dq[0], dq[1], u1, u2, arm)
        dq = dq + dt * jnp.stack([ddq1, ddq2])
        q = q + dt * dq
        x, y = fk_ee(q[0], q[1], arm.l1, arm.l2)
        row = jnp.stack([x, y, dq[0], dq[1], u1, u2])
        return (q, dq), row

    (_, _), rows = lax.scan(body, (q0, dq0), jnp.arange(num_steps))
    return rows


def save_path_file(path: str, rows) -> None:
    """Write rows in the reference's whitespace text format (np.loadtxt-able)."""
    np.savetxt(path, np.asarray(rows), fmt="%.18e")
