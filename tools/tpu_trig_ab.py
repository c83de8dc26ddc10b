"""On-chip A/B of the round-4 per-step-solve trig-carry optimization.

The per-step solve kernel (pallas_rollout._solve_kernel) used to spend 8
transcendental expansions per horizon step: 4 in the dynamics (cos q1,
cos q2, sin q2, cos(q1+q2)) and 4 in the tracking cost's EE FK (sin/cos of
q1 and q1+q2).  The whole-loop kernel (pallas_sim) has carried the FK
sin/cos into the next dynamics step via the angle-difference identities
since round 2; round 4 ports that scheme to the per-step kernel: 8 → 4
transcendentals per step.  Measured outcome (2026-08-20, one chip): 1.049x
at K=65536 (900.4 → 858.2 us/solve) but 0.78x at K=1024 (36.6 → 46.8 us) —
the carry wins in the throughput-bound regime (large sub) and loses in the
latency-bound one, so the production default is AUTO by tile size
(``trig_carry=None`` ⇒ carry iff sub >= 32).

This tool A/Bs both variants in one process on the real chip, same-day
same-tunnel numbers, at the K=65536 extreme shape (BASELINE config 3,
round-3 VERDICT item 6) and the K=1024 bench shape:

  * timing: chained solves (fuse_update, warm-started) at two chain
    lengths; the difference quotient cancels the fixed dispatch constant;
  * values: a single injected-eps solve per variant — the reassociated
    dynamics differ at ulp level, amplified through the chaotic rollout,
    so the gate is rtol on S and u_new (the bitwise gates live between
    masked/unmasked and pallas/XLA-identical-structure pairs, not across
    expression rewrites — same contract as tests/test_pallas.py::
    test_unroll_variants_equal).

    python tools/tpu_trig_ab.py
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_rollout as pr  # noqa: E402
from mppi_robotarm_tpu.ops.waypoint import slice_window  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_shape(k, arm, ref, out, rng):
    cfg = dataclasses.replace(MPPIConfig(), num_samples=k, horizon=50)
    window, valid = slice_window(ref, 0, cfg.search_idx_len)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def make_chain(n, tc):
        def chain():
            def body(c, _):
                u, seed = c
                w_eps, s, _ = pr.pallas_solve_core(
                    arm, cfg, x0, u, window, nvalid, seed=seed, step=seed,
                    fuse_update=True, emit_eps=False, unroll_t=True,
                    trig_carry=tc)
                return (w_eps, seed + 1), s[0:8]
            (u_f, _), ss = jax.lax.scan(
                body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
            return u_f, ss
        return jax.jit(chain)

    res = {}
    for tc in (False, True):
        t64 = timeit(make_chain(64, tc))
        t16 = timeit(make_chain(16, tc))
        res[tc] = (t64 - t16) / 48
        print(f"K={k} trig_carry={tc}: {res[tc] * 1e6:.1f} us/solve device",
              flush=True)

    # value gate: single solve, shared injected noise
    eps = jnp.asarray(rng.normal(size=(k, cfg.horizon, 2)).astype(np.float32)
                      * np.sqrt(20.0))
    vals = {}
    for tc in (False, True):
        u_new, s, _ = pr.pallas_solve_core(
            arm, cfg, x0, u0, window, nvalid, eps=eps, fuse_update=True,
            emit_eps=False, unroll_t=True, trig_carry=tc)
        vals[tc] = (np.asarray(s), np.asarray(u_new))
    np.testing.assert_allclose(vals[True][0], vals[False][0], rtol=1e-4)
    np.testing.assert_allclose(vals[True][1], vals[False][1],
                               rtol=1e-3, atol=1e-3)
    s_rel = np.max(np.abs(vals[True][0] / vals[False][0] - 1))
    u_abs = np.max(np.abs(vals[True][1] - vals[False][1]))
    speedup = res[False] / res[True]
    print(f"K={k}: {speedup:.3f}x ({res[False] * 1e6:.1f} -> "
          f"{res[True] * 1e6:.1f} us/solve); max|S rel| {s_rel:.1e}, "
          f"max|u_new abs| {u_abs:.1e}", flush=True)
    out[f"per_step_K{k}"] = {
        "direct_us": round(res[False] * 1e6, 1),
        "trig_carry_us": round(res[True] * 1e6, 1),
        "speedup": round(speedup, 3),
        "max_s_rel": float(s_rel), "max_u_abs": float(u_abs)}


def main():
    print("devices:", jax.devices(), flush=True)
    arm = ArmParams()
    ref = jnp.asarray(synth_circle_path(8000))
    rng = np.random.default_rng(42)
    out = {}
    bench_shape(65536, arm, ref, out, rng)
    bench_shape(1024, arm, ref, out, rng)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
