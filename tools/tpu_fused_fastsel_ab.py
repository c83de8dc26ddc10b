"""On-chip A/B of fast_select on the fused whole-loop kernel (round 4).

The per-step solve kernel's window-centered reduced selection metric
(tools/tpu_fastsel_ab.py, DESIGN.md item 15c) measured 1.051x in the
throughput-bound K=65536 regime.  The fused whole-loop kernel (the bench
headline path, K=1024, sub=8) is LATENCY-bound — the same regime where the
trig carry regressed (DESIGN.md item 14) — so the win is not assumed:
this tool A/Bs the fused closed loop with the exact vs the reduced leaf
metric via a _tracking_cost monkeypatch, in one process on the real chip,
BEFORE any default change.

Values: same seed ⇒ same noise stream; the two metrics differ only on fp
near-ties of the waypoint argmin, but over a 4000-step closed loop a
single flip chaos-amplifies, so records are compared statistically (final
tracking quality) rather than elementwise.

    python tools/tpu_fused_fastsel_ab.py
"""

import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_sim as ps  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402

ORIG = ps._tracking_cost


def set_fast(fast: bool):
    ps._tracking_cost = (functools.partial(ORIG, fast_select=True) if fast
                         else ORIG)


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    arm, sim = ArmParams(), SimConfig()
    ref = jnp.asarray(synth_circle_path(8000))
    ref_np = np.asarray(ref)
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
    dq0 = jnp.zeros(2, jnp.float32)
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def make_run(n):
        def run():
            rec, ufin = ps.pallas_sim_run(
                arm, cfg, sim, ref, q0, dq0, up, 0,
                jnp.asarray(7, jnp.int32), n, unroll_t=True)
            return rec, ufin
        return jax.jit(run)

    def onpath_mean_mm(rec):
        # record rows: lane layout per pallas_sim._REC; EE x/y live in the
        # same lanes the bench uses — recompute from q to stay layout-proof
        q1 = rec[:, 0]
        q2 = rec[:, 1]
        x = np.cos(q1) + np.cos(q1 + q2)
        y = np.sin(q1) + np.sin(q1 + q2)
        d = np.sqrt(
            (x[:, None] - ref_np[None, :, 0]) ** 2
            + (y[:, None] - ref_np[None, :, 1]) ** 2).min(axis=1)
        return float(d.mean() * 1e3)

    res = {}
    for fast in (False, True):
        set_fast(fast)
        f4k, f1k = make_run(4000), make_run(1000)
        t4k, t1k = timeit(f4k), timeit(f1k)
        t_step = (t4k - t1k) / 3000
        rec, ufin = jax.block_until_ready(f4k())
        rec = np.asarray(rec)
        err = onpath_mean_mm(rec[:1500])
        res[fast] = (t_step, err)
        print(f"fused K=1024 fast_select={fast}: {t_step * 1e6:.2f} us/step "
              f"device, on-path mean {err:.2f} mm (first 1500 steps)",
              flush=True)
    set_fast(False)
    speedup = res[False][0] / res[True][0]
    print(f"fused K=1024: fast_select is {speedup:.3f}x "
          f"({res[False][0] * 1e6:.2f} -> {res[True][0] * 1e6:.2f} us/step); "
          f"tracking {res[False][1]:.2f} vs {res[True][1]:.2f} mm",
          flush=True)
    out = {"fused_K1024": {
        "exact_us": round(res[False][0] * 1e6, 2),
        "fast_select_us": round(res[True][0] * 1e6, 2),
        "speedup": round(speedup, 3),
        "exact_onpath_mm": round(res[False][1], 2),
        "fast_onpath_mm": round(res[True][1], 2)}}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
