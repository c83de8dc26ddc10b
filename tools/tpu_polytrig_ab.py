"""On-chip A/B: incremental-rotation trig vs transcendental expansion.

After approx_recip (DESIGN item 19) the longest remaining latency links on
the fused loop's per-step critical chain are the 4 transcendental
expansions cos/sin(q1), cos/sin(q1+q2).  The carry already holds the
previous step's pair and the per-step increment is small (d = dq·dt), so
``poly_trig`` replaces them with a 5th/4th-order Maclaurin cos/sin of d
plus one Givens rotation (~20 FMA-class ops, error ≲ d⁵/120 ≈ 5e-8,
non-accumulating across solves) — pallas_rollout._poly_rot.

Both production regimes, production defaults otherwise (approx_recip on):

    python tools/tpu_polytrig_ab.py [fused|solve|all]
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

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_rollout as pr  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_sim as ps  # noqa: E402
from mppi_robotarm_tpu.ops.waypoint import slice_window  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402
from tools.tpu_window_sweep import onpath_mm_from_kernel_rec  # noqa: E402


def timeit(fn, reps=6):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    arm, sim = ArmParams(), SimConfig()
    ref = jnp.asarray(synth_circle_path(8000))
    ref_np = np.asarray(ref)
    out = {}

    if section in ("all", "fused"):
        cfg1k = dataclasses.replace(MPPIConfig(), num_samples=1024,
                                    horizon=50)
        q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
        dq0 = jnp.zeros(2, jnp.float32)
        up = jnp.tile(jnp.asarray(cfg1k.warm_start, jnp.float32),
                      (cfg1k.horizon, 1))

        def make_run(n, poly):
            def run():
                return ps.pallas_sim_run(arm, cfg1k, sim, ref, q0, dq0, up,
                                         0, jnp.asarray(7, jnp.int32), n,
                                         unroll_t=True, poly_trig=poly)
            return jax.jit(run)

        resf = {}
        for poly in (False, True):
            t4k = timeit(make_run(4000, poly))
            t1k = timeit(make_run(1000, poly))
            t_step = (t4k - t1k) / 3000
            rec, _ = jax.block_until_ready(make_run(4000, poly)())
            err = onpath_mm_from_kernel_rec(np.asarray(rec), ref_np[:, 0:2])
            resf[poly] = (t_step, err)
            name = "poly_trig" if poly else "orig"
            print(f"fused K=1024 {name}: {t_step * 1e6:.2f} us/step device, "
                  f"on-path {err:.2f} mm", flush=True)
        print(f"fused K=1024: poly_trig is "
              f"{resf[False][0] / resf[True][0]:.3f}x", flush=True)
        out["fused_K1024"] = {
            "orig_us": round(resf[False][0] * 1e6, 2),
            "poly_us": round(resf[True][0] * 1e6, 2),
            "speedup": round(resf[False][0] / resf[True][0], 3),
            "orig_onpath_mm": round(resf[False][1], 2),
            "poly_onpath_mm": round(resf[True][1], 2)}

    if section in ("all", "solve"):
        cfg = dataclasses.replace(MPPIConfig(), num_samples=65536,
                                  horizon=50)
        window65, valid65 = slice_window(ref, 0, cfg.search_idx_len)
        nvalid65 = jnp.sum(valid65.astype(jnp.float32))
        x0s = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
        u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                      (cfg.horizon, 1))

        def make_chain(n, poly):
            def chain():
                def body(c, _):
                    u_c, seed_c = c
                    w_eps, s, _ = pr.pallas_solve_core(
                        arm, cfg, x0s, u_c, window65, nvalid65, seed=seed_c,
                        step=seed_c, fuse_update=True, emit_eps=False,
                        unroll_t=True, poly_trig=poly)
                    return (w_eps, seed_c + 1), s[0:8]
                (u_f, _), ss = jax.lax.scan(
                    body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
                return u_f, ss
            return jax.jit(chain)

        ress = {}
        for poly in (False, True):
            t64 = timeit(make_chain(64, poly))
            t16 = timeit(make_chain(16, poly))
            t = (t64 - t16) / 48
            ress[poly] = t
            name = "poly_trig" if poly else "orig"
            print(f"solve K=65536 {name}: {t * 1e6:.1f} us/solve device "
                  f"({1 / t:,.0f} solves/s)", flush=True)
        print(f"solve K=65536: poly_trig is {ress[False] / ress[True]:.3f}x",
              flush=True)
        out["solve_K65536"] = {
            "orig_us": round(ress[False] * 1e6, 1),
            "poly_us": round(ress[True] * 1e6, 1),
            "speedup": round(ress[False] / ress[True], 3)}

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
