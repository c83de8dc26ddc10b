"""Long-horizon fused-loop vs per-step-driver parity ON CHIP (round-1 W2).

Runs the whole-loop fused kernel (ops/pallas_sim.py) and the per-step driver
on the SAME injected noise stream for N closed-loop steps on the real TPU,
then reports the discrete agreement that chaos cannot fake:

  * the wp_idx schedule agreement prefix and full-sequence match fraction,
  * the max |q| / |u| divergence envelope per step (expected to grow at the
    measured Lyapunov rate ~x2-4/step from ulp-level summation-order
    differences — see docs/PARITY_RUN.md),
  * full-run tracking-error statistics of both backends (must be
    distribution-identical).

Usage: python tools/tpu_fused_longrun.py [steps]
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    arm, cfg, sim = m.circle_tracking_preset()   # K=100, T=30 (reference)
    ref = jnp.asarray(m.load_ref_path("/root/reference/xydq_circle.txt"),
                      jnp.float32)
    rng = np.random.default_rng(0)
    eps = (rng.normal(size=(steps, cfg.num_samples, cfg.horizon, 2))
           * np.sqrt(20.0)).astype(np.float32)

    print(f"devices: {jax.devices()}  steps={steps}")
    t0 = time.perf_counter()
    s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
    final_f, rec_f = m.simulate_fused(arm, cfg, sim, ref, s0, steps,
                                      eps_per_step=eps)
    jax.block_until_ready(rec_f.q)
    print(f"fused: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    s0b = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
    _, recs = m.simulate_python(arm, cfg, sim, ref, s0b, steps,
                                eps_per_step=[jnp.asarray(e) for e in eps])
    print(f"per-step: {time.perf_counter() - t0:.1f}s")

    q_f = np.asarray(rec_f.q)
    u_f = np.asarray(rec_f.u)
    wp_f = np.asarray(rec_f.wp_idx)
    q_p = np.array([r[0] for r in recs])
    u_p = np.array([r[2] for r in recs])
    wp_p = np.array([r[3] for r in recs])

    qd = np.max(np.abs(q_f - q_p), axis=1)
    ud = np.max(np.abs(u_f - u_p), axis=1)
    wp_eq = wp_f == wp_p
    prefix = int(np.argmin(wp_eq)) if not wp_eq.all() else steps
    for mark in (0, 9, 24, 49, 99, steps - 1):
        if mark < steps:
            print(f"  step {mark:4d}: |dq|={qd[mark]:.3e} |du|={ud[mark]:.3e}"
                  f" wp {wp_f[mark]:4d} vs {wp_p[mark]:4d}")
    print(f"wp schedule: exact prefix {prefix} steps; "
          f"match fraction {wp_eq.mean():.3f}; "
          f"final {wp_f[-1]} vs {wp_p[-1]}")
    print(f"|dq|: <1e-6 for {int(np.argmax(qd > 1e-6)) if (qd > 1e-6).any() else steps} steps; "
          f"<1e-3 for {int(np.argmax(qd > 1e-3)) if (qd > 1e-3).any() else steps} steps; "
          f"max over run {qd.max():.3e}")

    step_ref = np.asarray(ref)[1:steps + 1, 0:2]
    ee_f = np.asarray(rec_f.ee)
    x_p, y_p = np.cos(q_p[:, 0]) + np.cos(q_p.sum(1)), np.sin(
        q_p[:, 0]) + np.sin(q_p.sum(1))
    ee_p = np.stack([x_p, y_p], axis=1)
    sf = tracking_errors(ee_f, step_ref, full_path=np.asarray(ref))
    sp = tracking_errors(ee_p, step_ref, full_path=np.asarray(ref))
    print(f"on-path EE mean: fused {sf['onpath_mean_m'] * 1e3:.2f} mm | "
          f"per-step {sp['onpath_mean_m'] * 1e3:.2f} mm")
    print(f"step-aligned RMS: fused {sf['ee_rms_m'] * 1e3:.1f} mm | "
          f"per-step {sp['ee_rms_m'] * 1e3:.1f} mm")


if __name__ == "__main__":
    main()
