"""Gate calibration at the EXACT bench configuration (round-3 VERDICT item 1).

Runs bench.py's precise program — benchmark_preset (K=1024, H=50),
``synth_circle_path(8000)``, the 4000-step fused chain, on-path EE error over
the first 1500 live steps — for N seeds on the real chip, and prints the
spread the bench gate must be calibrated against.  (The round-3 gate, 15 mm,
was calibrated on a different configuration and failed every seed.)

With ``high_accuracy`` as a second argument the same sweep runs the
``high_accuracy_preset`` (delta_t = 0.003, round-4 Q2 mechanism isolation)
at the bench shape instead — the calibration source for bench.py's
high-accuracy quality gate (round-4 VERDICT item 1).

Usage: python tools/tpu_bench_gate_sweep.py [n_seeds] [bench|high_accuracy]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

import mppi_robotarm_tpu as m  # noqa: E402
from tools.tpu_window_sweep import onpath_mm  # noqa: E402


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    preset = sys.argv[2] if len(sys.argv) > 2 else "bench"
    if preset == "high_accuracy":
        arm, cfg, sim = m.high_accuracy_preset()
    else:
        arm, cfg, sim = m.benchmark_preset()
    path = m.synth_circle_path(8000)
    ref = jnp.asarray(path)
    steps = 4000
    print(f"devices: {jax.devices()}  K={cfg.num_samples} H={cfg.horizon} "
          f"path=8000pt steps={steps} gate-window=first 1500 live")
    errs = []
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(seed))
        final, rec = m.simulate_fused(arm, cfg, sim, ref, s0, steps)
        jax.block_until_ready(rec.q)
        e = onpath_mm(np.asarray(rec.ee), np.asarray(rec.done), path[:, 0:2])
        errs.append(e)
        print(f"  seed {seed}: on-path mean {e:6.2f} mm  "
              f"final-wp {int(np.asarray(rec.wp_idx)[-1])}  "
              f"({time.perf_counter() - t0:.1f}s)")
    errs = np.asarray(errs)
    print(f"spread over {n_seeds} seeds: min {errs.min():.1f} / "
          f"mean {errs.mean():.1f} / max {errs.max():.1f} mm")
    print(f"suggested gate (max + 30% margin): "
          f"{np.ceil(errs.max() * 1.3):.0f} mm")


if __name__ == "__main__":
    main()
