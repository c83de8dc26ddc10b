"""Root-cause sweep for the H=50 / dense-path tracking degradation (round-3
VERDICT item 2).

The round-3 bench (K=1024, H=50, ``synth_circle_path(8000)``) tracked at
15.4-26.5 mm on-path mean vs 5.9-11.0 mm for the H=30 / 2000-pt parity runs.
Two mechanisms are plausible and this tool separates them:

  * **Frozen-window saturation** (VERDICT hypothesis): the 30-row window
    (Q5 parity, control.py:203) spans 1.5% of a 2000-pt circle but only
    0.375% of an 8000-pt one (~14 mm of arc), while the H=50 rollout
    simulates 0.3 s — samples run off the window and the cost gradient
    saturates.  Test: sweep ``search_idx_len`` 30/60/120/240 at fixed path.
  * **Path-speed confound** (found reading ``synth_circle_path``): the dq
    reference columns are ``gradient(r)/dt`` — at 4x the density with the
    same dt=0.003 the implied joint velocities are 4x SLOWER than the
    reference path's.  The dq cost weights (5,5 stage / 50,50 terminal) then
    drive a different trajectory.  Test: same density with dt scaled to
    restore reference speed (dt=0.003/4).

Grid: (path_pts, synth_dt, H, W) x seeds, fused backend (the bench path),
K=1024, on-path (lag-free) EE error over the first 1500 live steps — the
exact bench gate statistic (bench.py:119-132).

Usage: python tools/tpu_window_sweep.py [n_seeds] [steps]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import mppi_robotarm_tpu as m  # noqa: E402


def onpath_mm(ee: np.ndarray, done: np.ndarray, path_xy: np.ndarray,
              gate_steps: int = 1500) -> float:
    """bench.py's gate statistic: mean min-distance to path, first live steps."""
    live = ~done
    ee = ee[live][:gate_steps]
    if len(ee) < 100:
        return float("nan")
    out = np.empty(len(ee))
    for i in range(0, len(ee), 256):
        d = np.linalg.norm(ee[i:i + 256, None, :] - path_xy[None], axis=-1)
        out[i:i + 256] = d.min(axis=1)
    return float(out.mean() * 1e3)


def onpath_mm_from_kernel_rec(rec: np.ndarray, path_xy: np.ndarray,
                              gate_steps: int = 1500) -> float:
    """:func:`onpath_mm` over raw fused-kernel record rows.

    EE is recomputed from the q lanes (layout-proof, lanes per
    pallas_sim._REC_LANES); the done flag is lane 7.  Shared by the
    round-5 A/B tools so every tool gates on the SAME quality metric.
    """
    q1, q2 = rec[:, 0], rec[:, 1]
    ee = np.stack([np.cos(q1) + np.cos(q1 + q2),
                   np.sin(q1) + np.sin(q1 + q2)], axis=1)
    return onpath_mm(ee, rec[:, 7] > 0.5, path_xy, gate_steps)


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    arm, cfg0, sim = m.benchmark_preset()      # K=1024, H=50

    # (label, path_pts, synth_dt, horizon, window)
    grid = [
        ("bench-today      ", 8000, 0.003, 50, 30),
        ("W=60             ", 8000, 0.003, 50, 60),
        ("W=120            ", 8000, 0.003, 50, 120),
        ("W=240            ", 8000, 0.003, 50, 240),
        ("ref-speed dq     ", 8000, 0.003 / 4, 50, 30),
        ("ref-speed + W=120", 8000, 0.003 / 4, 50, 120),
        ("2000-pt path     ", 2000, 0.003, 50, 30),
        ("2000-pt H=30     ", 2000, 0.003, 30, 30),
        ("8000-pt H=30     ", 8000, 0.003, 30, 30),
    ]
    print(f"devices: {jax.devices()}  K={cfg0.num_samples} seeds={n_seeds} "
          f"steps={steps}")
    print(f"{'config':<18} {'pts':>5} {'dt':>8} {'H':>3} {'W':>4}  "
          f"on-path mm per seed")
    for label, pts, sdt, H, W in grid:
        cfg = dataclasses.replace(cfg0, horizon=H, search_idx_len=W)
        path = m.synth_circle_path(pts, dt=sdt)
        ref = jnp.asarray(path)
        errs, wps = [], []
        t0 = time.perf_counter()
        for seed in range(n_seeds):
            s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(seed))
            final, rec = m.simulate_fused(arm, cfg, sim, ref, s0, steps)
            jax.block_until_ready(rec.q)
            errs.append(onpath_mm(np.asarray(rec.ee), np.asarray(rec.done),
                                  path[:, 0:2]))
            wps.append(int(np.asarray(rec.wp_idx)[-1]))
        per_seed = " ".join(f"{e:6.1f}" for e in errs)
        print(f"{label:<18} {pts:>5} {sdt:>8.5f} {H:>3} {W:>4}  [{per_seed}] "
              f"mean {np.nanmean(errs):6.1f}  final-wp {wps} "
              f"({time.perf_counter() - t0:.0f}s)")


if __name__ == "__main__":
    main()
