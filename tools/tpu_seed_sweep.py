"""Closed-loop tracking quality across PRNG seeds (realization spread).

Runs the full 1500-step circle run (reference config, K=100, T=30) on chip
for several seeds and reports the lag-free on-path EE error per seed —
establishing the noise-realization spread that single-run comparisons
(docs/PARITY_RUN.md) must be read against.

``mode`` selects the noise/compute path being swept:
  * ``fused``  — the whole-loop Pallas kernel (hardware-PRNG batched
    Box-Muller stream), the throughput path;
  * ``xla``    — ``simulate(backend='xla')`` with threefry noise, f32: the
    EXACT configuration of PARITY_RUN.md run C, so its seed spread brackets
    (or indicts) run C's single-seed 21.7 mm (round-2 W2);
  * ``pallas`` — the per-step fused-solve scan driver.

Usage: python tools/tpu_seed_sweep.py [n_seeds] [steps] [mode] [K]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import mppi_robotarm_tpu as m  # noqa: E402
from mppi_robotarm_tpu.utils.metrics import tracking_errors  # noqa: E402


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    mode = sys.argv[3] if len(sys.argv) > 3 else "fused"
    arm, cfg, sim = m.circle_tracking_preset()
    if len(sys.argv) > 4:
        import dataclasses
        cfg = dataclasses.replace(cfg, num_samples=int(sys.argv[4]))
    ref = jnp.asarray(m.load_ref_path("/root/reference/xydq_circle.txt"),
                      jnp.float32)
    refn = np.asarray(ref)
    print(f"devices: {jax.devices()}  seeds={n_seeds} steps={steps} "
          f"mode={mode} K={cfg.num_samples}")
    onpath, aligned, wps = [], [], []
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(seed))
        if mode == "fused":
            final, rec = m.simulate_fused(arm, cfg, sim, ref, s0, steps)
        else:
            final, rec = m.simulate(arm, cfg, sim, ref, s0, steps,
                                    backend=mode)
        jax.block_until_ready(rec.q)
        ee = np.asarray(rec.ee)
        st = tracking_errors(ee, refn[1:steps + 1, 0:2], full_path=refn)
        onpath.append(st["onpath_mean_m"] * 1e3)
        aligned.append(st["ee_rms_m"] * 1e3)
        wps.append(int(np.asarray(rec.wp_idx)[-1]))
        print(f"  seed {seed}: on-path mean {onpath[-1]:6.2f} mm | "
              f"step-aligned RMS {aligned[-1]:6.1f} mm | final wp {wps[-1]}"
              f"  ({time.perf_counter() - t0:.1f}s)")
    print(f"[{mode}] on-path mean over seeds: {np.mean(onpath):.2f} mm "
          f"(min {np.min(onpath):.2f}, max {np.max(onpath):.2f}); "
          f"reference's own executed run: 10.76 mm (PARITY_RUN.md)")


if __name__ == "__main__":
    main()
