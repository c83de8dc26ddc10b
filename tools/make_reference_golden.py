"""Capture golden closed-loop records from the ACTUAL reference implementation.

Executes the real ``/root/reference`` code (control.py + utils.py, imported,
not copied) under the exact run.py:25-37 configuration and the run.py:48-71
loop semantics, with the global NumPy RNG seeded (``np.random.seed(0)``) so
the otherwise-unseeded noise (quirk Q8) is reproducible.

The per-step noise draw is one ``np.random.multivariate_normal(0, sigma,
(K, T))`` call per solve (control.py:163), so the identical noise stream can
be regenerated from ``np.random.RandomState(0)`` without storing the ~31 MB
tensor — tests re-derive it and inject it into the framework solver.

Saves ``tests/data/reference_golden_run.npz`` with per-step arrays:
    q (S,2), dq (S,2), u (S,2)  — state AFTER the plant step and the applied
                                   control, exactly run.py:53-70 ordering
    wp_idx (S,)                 — controller's prev_waypoints_idx after solve
    x0 (4,)                     — initial state (run.py:14-15)
plus the config scalars used.  S = number of completed steps before the
reference raised IndexError at the path end (control.py:76-78) or the
1500-step budget (run.py:11) ran out.

Usage:  python tools/make_reference_golden.py [--steps 1500] [--out PATH]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

import numpy as np

REFERENCE_DIR = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500,
                    help="max plant steps (run.py:11 iter)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "reference_golden_run.npz"))
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE_DIR)
    import matplotlib
    matplotlib.use("Agg")
    from control import MPPIControllerForPathTracking  # noqa: E402
    from utils import Arm_Dynamic  # noqa: E402

    ref_path = np.loadtxt(os.path.join(REFERENCE_DIR, "xydq_circle.txt"))
    ref_path = ref_path[:, 0:4]                      # run.py:18-19

    dt = 0.003                                       # run.py:10
    np.random.seed(args.seed)                        # makes Q8 reproducible
    mppi = MPPIControllerForPathTracking(            # run.py:25-37
        delta_t=dt * 2,
        ref_path=ref_path,
        horizon_step_T=30,
        number_of_samples_K=100,
        param_exploration=0.0,
        param_lambda=100.0,
        param_alpha=0.98,
        sigma=np.array([[20.0, 0.0], [0.0, 20.0]]),
        stage_cost_weight=np.array([0.50, 0.50, 5.0, 5.0]),
        terminal_cost_weight=np.array([5.0, 5.0, 50.0, 50.0]),
        visualze_sampled_trajs=False,   # viz only; consumes no RNG
    )

    q = np.array([1.152198236517471885e+00, -1.266101672070702344e+00])
    dq = np.array([0.0, 0.0])                        # run.py:14-15
    state = [q[0], q[1], dq[0], dq[1]]               # run.py:23 (a list)
    x0 = np.array(state)

    qs, dqs, us, wps = [], [], [], []
    t_start = time.perf_counter()
    for k in range(1, args.steps + 1):               # run.py:48
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                u, _, _, _ = mppi.calc_control_input(observed_x=state)
        except IndexError:
            print(f"reference raised IndexError (path end) at step {k}")
            break
        dq += dt * Arm_Dynamic(q, dq, u)             # run.py:53
        q += dt * dq                                 # run.py:55
        state = np.concatenate((q, dq))              # run.py:59
        qs.append(q.copy())
        dqs.append(dq.copy())
        us.append(np.array(u, dtype=np.float64))
        wps.append(mppi.prev_waypoints_idx)
        if k % 100 == 0:
            el = time.perf_counter() - t_start
            print(f"step {k}/{args.steps}  ({el:.1f}s, "
                  f"{k / el:.1f} steps/s)  wp={mppi.prev_waypoints_idx}")

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        q=np.array(qs), dq=np.array(dqs), u=np.array(us),
        wp_idx=np.array(wps, dtype=np.int64), x0=x0,
        seed=args.seed, dt=dt, delta_t=dt * 2, horizon=30, num_samples=100,
        lam=100.0, alpha=0.98, sigma_diag=20.0,
        # the run's input path rides along so the test suite is fully
        # self-contained (no dependency on the read-only reference mount)
        ref_path=ref_path,
    )
    print(f"wrote {out}: {len(qs)} steps")


if __name__ == "__main__":
    main()
