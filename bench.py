"""Headline benchmark: MPPI solves/s per chip at the north-star shape.

Runs the scan-compiled closed-loop simulator (solve K=1024 samples over an
H=50 horizon + plant step, per iteration) on one chip and reports
steady-state solves/s.  Dispatch-amortised per SURVEY.md §6(e): the solve
loop runs ON DEVICE inside one ``lax.scan`` program; timing wraps
``block_until_ready``.

Baseline: the reference implementation measured ~199 ms/solve at K=100,T=30
on one CPU core and scales ~linearly in K·T ⇒ ~7.0 s/solve at K=1024,H=50
(BASELINE.md) ⇒ 0.143 solves/s.  BASELINE.json north-star target: ≥1000.

Prints ONE JSON line (the driver contract).  Round-5 (VERDICT item 1): the
line now also carries QUALITY and TRUE DEVICE RATE so regressions in either
are visible round-over-round, not just gated:

  * ``on_path_mean_mm`` — the tracking quality the gate asserts on (was
    previously computed, asserted, and thrown away);
  * ``device_us_per_step`` — the two-chain-length fit's device-only rate
    (the wall-clock headline carries ~35% fixed tunnel dispatch);
  * ``high_accuracy_on_path_mean_mm`` — a second gated tracking run of
    ``high_accuracy_preset`` (delta_t = 0.003, the round-4 Q2 mechanism
    fix) at the same shape, with its own calibrated gate — the framework's
    "beats the reference's tracking" claim, re-measured every round.

By default every backend (pallas-fused whole-loop kernel, per-step fused
pallas solve, portable XLA scan) is measured and reported on stderr so
regressions in the fallback paths stay visible; pass ``--first-only`` to
stop at the first working backend (bounded wall time for quick runs; skips
the high-accuracy run and the slope fit).
"""

import json
import sys
import time

import numpy as np


REFERENCE_SOLVES_PER_S = 1.0 / 6.96  # extrapolated reference @ K=1024, H=50


def main() -> None:
    import jax
    import jax.numpy as jnp
    from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from mppi_robotarm_tpu import (
        benchmark_preset, init_sim, simulate, simulate_fused,
        synth_circle_path,
    )

    arm, cfg, sim = benchmark_preset()          # K=1024, H=50
    ref_path = jnp.asarray(synth_circle_path(8000))
    # Long on-device chain: the axon-tunnel environment adds ~25-27 ms of
    # FIXED host/dispatch latency per program invocation (measured by the
    # two-length fit below and tools/tpu_overhead.py).  At 1000 steps that
    # constant is ~2/3 of the wall time of the fused kernel (~11 us/step on
    # device), so the chain is 4000 steps: overhead amortises to ~35%->
    # ~12% and the headline reflects steady-state throughput.  The stderr
    # breakdown separates the true device rate from the tunnel constant.
    steps = 4000

    state0 = init_sim(cfg, sim, jax.random.PRNGKey(0))
    # Fastest first: the fully-fused closed-loop kernel (whole loop in one
    # kernel invocation), then the per-step fused-solve path, then the
    # portable XLA scan.
    first_only = "--first-only" in sys.argv

    def run_fused(n):
        return simulate_fused(arm, cfg, sim, ref_path, state0, n)

    def run_scan(backend):
        return lambda n: simulate(arm, cfg, sim, ref_path, state0, n,
                                  backend=backend)

    results = {}
    for name, runner in (("pallas-fused", run_fused),
                         ("pallas", run_scan("pallas")),
                         ("xla", run_scan("xla"))):
        try:
            out = runner(steps)
            jax.block_until_ready(out)          # compile + warmup
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = runner(steps)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            results[name] = (steps / min(times), out)
            print(f"# backend {name}: {steps / min(times):.1f} solves/s",
                  file=sys.stderr)
            if first_only:
                break
        except Exception as e:  # fall back to the next path
            print(f"backend {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    assert results, "no backend produced a result"
    best_backend = max(results, key=lambda b: results[b][0])
    solves_per_s, out = results[best_backend]
    print(f"# best backend: {best_backend}", file=sys.stderr)

    # Decompose wall time into device rate + fixed dispatch constant with a
    # second, shorter chain of the winning backend (two-point fit).
    device_us_per_step = None
    if best_backend == "pallas-fused" and not first_only:
        try:
            short = 1000
            runner = run_fused
            t_s = []
            jax.block_until_ready(runner(short))
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(runner(short))
                t_s.append(time.perf_counter() - t0)
            t_long = steps / solves_per_s
            slope = (t_long - min(t_s)) / (steps - short)
            fixed = t_long - slope * steps
            device_us_per_step = 1e6 * slope
            print(f"# device-only: {1e6 * slope:.2f} us/step "
                  f"({1 / slope:,.0f} solves/s); fixed dispatch "
                  f"{fixed * 1e3:.1f} ms/launch", file=sys.stderr)
        except Exception as e:
            print(f"# slope fit skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # Sanity: the run must actually track (guards against a degenerate bench).
    # On-path (lag-free) EE error over the first 1500 live steps.  Gate
    # calibrated at THIS exact configuration (K=1024, H=50, 8000-pt synth
    # path, 4000-step chain): 8-seed on-chip spread 8.4-31.7 mm, mean 21.0
    # (tools/tpu_bench_gate_sweep.py, 2026-08-20; docs/PARITY_RUN.md) ->
    # gate = max + 30% margin = 42 mm.  H=50 tracks ~2x worse than the H=30
    # parity config by MECHANISM, not defect: the Q2 controller-model
    # timestep (delta_t = 0.006 = 2x plant dt, reference control.py:256-259)
    # compounds over the 0.3 s lookahead — proven by the delta_t=0.003
    # control experiment (6.1 mm at H=50) and by refuting the window
    # (W 30->240: flat), density (2000 vs 8000 pt at H=30: identical) and
    # sample-sparsity (K=4096: no change) hypotheses.  See
    # tools/tpu_window_sweep.py / tools/tpu_horizon_sweep.py outputs in
    # docs/PARITY_RUN.md.  The round-3 gate (15 mm) was calibrated on the
    # H=30 config and failed every seed here.
    def chunked_onpath_mean_mm(ee, path_xy):
        """Mean min-distance to the path in mm (256-row chunks)."""
        on_path = np.empty(len(ee))
        for i in range(0, len(ee), 256):
            d = np.linalg.norm(ee[i:i + 256, None, :] - path_xy[None],
                               axis=-1)
            on_path[i:i + 256] = d.min(axis=1)
        return float(on_path.mean() * 1e3)

    rec = out[1]
    ee = np.asarray(rec.ee)
    live = ~np.asarray(rec.done)
    ee = ee[live][:1500]
    path_xy = np.asarray(ref_path)[:, 0:2]
    assert np.isfinite(solves_per_s) and len(ee) >= 1000, (
        solves_per_s, len(ee))
    on_path_mean_mm = chunked_onpath_mean_mm(ee, path_xy)
    assert on_path_mean_mm < 42.0, (
        f"degenerate bench run: on-path EE error {on_path_mean_mm:.1f} "
        f"mm mean (gate 42 mm; 8-seed calibration 8.4-31.7 mm at this exact "
        f"config)")

    # ---- high-accuracy tracking run (round-5 VERDICT item 1) --------------
    # Same shape (K=1024, H=50, 8000-pt path, 4000-step chain), controller
    # delta_t matched to the plant (high_accuracy_preset, the round-4 Q2
    # mechanism isolation).  Gate calibrated from on-chip seed sweeps at
    # THIS configuration (tools/tpu_bench_gate_sweep.py N high_accuracy,
    # 2026-08-21): 8 seeds pre-approx_recip spread 4.1-11.9 mm mean 7.0;
    # 4 seeds WITH the round-5 approx_recip production default spread
    # 3.7-13.8 mm mean 8.1 — vs the parity semantics' 8.4-31.7 / 21.0 at
    # the same shape, and the reference loop's measured 10.8 mm at its own
    # config (BASELINE.md).
    HA_GATE_MM = 18.0     # max observed (13.8, post-recip sweep) + 30%
    ha_mm = None
    # Only run when the fused backend itself just worked: the HA chain is
    # the same hardware-PRNG pallas kernel, so on a host where that backend
    # is unavailable (CPU fallback day) this block would crash AFTER the
    # backend loop had already fallen back gracefully — the quality gate
    # itself (the assert below) must still fail LOUDLY on a tracking
    # regression when the kernel runs.
    if not first_only and "pallas-fused" in results:
        from mppi_robotarm_tpu import high_accuracy_preset
        arm_h, cfg_h, sim_h = high_accuracy_preset()
        state_h = init_sim(cfg_h, sim_h, jax.random.PRNGKey(0))
        _, rec_h = simulate_fused(arm_h, cfg_h, sim_h, ref_path,
                                  state_h, steps)
        jax.block_until_ready(rec_h.q)
        ee_h = np.asarray(rec_h.ee)[~np.asarray(rec_h.done)][:1500]
        ha_mm = chunked_onpath_mean_mm(ee_h, path_xy)
        print(f"# high_accuracy_preset: on-path mean {ha_mm:.2f} mm "
              f"(gate {HA_GATE_MM} mm)", file=sys.stderr)
        assert ha_mm < HA_GATE_MM, (
            f"high-accuracy tracking regression: {ha_mm:.2f} mm mean "
            f"(gate {HA_GATE_MM} mm from the on-chip calibration sweeps)")

    out = {
        "metric": "mppi_solves_per_s_per_chip_K1024_H50",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
        "on_path_mean_mm": round(on_path_mean_mm, 2),
    }
    if device_us_per_step is not None:
        out["device_us_per_step"] = round(device_us_per_step, 2)
    if ha_mm is not None:
        out["high_accuracy_on_path_mean_mm"] = round(ha_mm, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
