"""Mechanism isolation for the H=50 tracking degradation (round-3 VERDICT
item 2, second stage — tpu_window_sweep.py refuted the frozen-window and
path-density/speed hypotheses; the gap follows the horizon alone).

Candidate mechanisms this grid separates (all on the 2000-pt circle, W=30):

  * **Simulated time-span** (H*delta_t): longer lookahead compounds the Q2
    controller/plant model mismatch (delta_t=0.006 vs plant dt=0.003) and
    weights later (more uncertain) states equally.  Rows: H=25/30/40/50/60
    at delta_t=0.006 (spans 0.15-0.36 s), plus H=50 at delta_t=0.003
    (0.15 s span with 50 steps, and the model timestep matches the plant).
  * **Noise-space sparsity**: the sample space is R^(2H); at fixed K=1024
    the coverage density drops with H.  Rows: H=50 with K=4096/16384.

Usage: python tools/tpu_horizon_sweep.py [n_seeds] [steps]
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
from tools.tpu_window_sweep import onpath_mm  # noqa: E402


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    arm, cfg0, sim = m.benchmark_preset()      # K=1024, H=50 base
    path = m.synth_circle_path(2000)
    ref = jnp.asarray(path)

    # (label, horizon, delta_t, K)
    grid = [
        ("H=25 (0.15s)     ", 25, 0.006, 1024),
        ("H=30 (0.18s)     ", 30, 0.006, 1024),
        ("H=40 (0.24s)     ", 40, 0.006, 1024),
        ("H=50 (0.30s)     ", 50, 0.006, 1024),
        ("H=60 (0.36s)     ", 60, 0.006, 1024),
        ("H=50 dt3 (0.15s) ", 50, 0.003, 1024),
        ("H=50 K=4096      ", 50, 0.006, 4096),
        ("H=50 K=8192      ", 50, 0.006, 8192),   # fused-kernel tile cap
    ]
    print(f"devices: {jax.devices()}  seeds={n_seeds} steps={steps} "
          f"path=2000pt W=30")
    print(f"{'config':<18} {'H':>3} {'dt':>6} {'K':>6}  on-path mm per seed")
    for label, H, dt_c, K in grid:
        cfg = dataclasses.replace(cfg0, horizon=H, delta_t=dt_c,
                                  num_samples=K)
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
        print(f"{label:<18} {H:>3} {dt_c:>6.4f} {K:>6}  [{per_seed}] "
              f"mean {np.nanmean(errs):6.1f}  final-wp {wps} "
              f"({time.perf_counter() - t0:.0f}s)")


if __name__ == "__main__":
    main()
