"""On-chip A/B: packed-argmin vs 5-tuple window tournament (round-5 item 2).

The window tournament is the measured top op consumer of the rollout
(~83% of counted ops, tools/tpu_roofline.py), and its 5-tuple merges cost
6 vector ops each (1 compare + 5 selects).  The packed-argmin variant
(pallas_rollout._tracking_cost packed_select=True) reduces every merge to
ONE integer ``min`` — the non-negative squared-distance metric is bitcast
to int32 (order-preserving), its low 5 mantissa bits replaced by the row
index (ties resolve to the smaller index = the reference's first-win
rule) — and reconstructs the winner's 4 window values once at the root
with a one-hot masked sum tree.

Op-count accounting says this likely LOSES: the reconstruction costs
~30 compares + 120 selects + 116 adds, more than the 145 select/compare
ops the merges save, and the kernels have idle issue slots (41% / 29% of
the VLIW ceiling) only if the limiter is chain latency — which the packed
tree shortens (depth 5×1 vs 5×2) but the reconstruction re-lengthens.
Nobody had measured; this tool does, in both production regimes:

  * the fused whole-loop kernel (bench headline, K=1024, sub=8,
    latency-bound) — via pallas_sim_run(packed_select=...)
  * the per-step solve kernel at K=65536 (sub=64, throughput-bound) —
    via pallas_solve_batched(packed_select=...)

Tracking quality is reported alongside (the packed metric's low-5-bit
quantisation can flip fp near-tie selections, same equivalence class as
fast_select's reassociation flips).

    python tools/tpu_tournament_ab.py
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
from mppi_robotarm_tpu.ops import pallas_sim as ps  # noqa: E402
from mppi_robotarm_tpu.ops.pallas_rollout import pallas_solve_batched  # noqa: E402
from mppi_robotarm_tpu.ops.waypoint import slice_window  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402
from tools.tpu_window_sweep import onpath_mm_from_kernel_rec  # noqa: E402


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def fused_loop_ab(arm, sim, ref, ref_np, out):
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
    dq0 = jnp.zeros(2, jnp.float32)
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (cfg.horizon, 1))

    def make_run(n, packed):
        def run():
            return ps.pallas_sim_run(
                arm, cfg, sim, ref, q0, dq0, up, 0,
                jnp.asarray(7, jnp.int32), n, unroll_t=True,
                packed_select=packed)
        return jax.jit(run)

    res = {}
    for packed in (False, True):
        f4k, f1k = make_run(4000, packed), make_run(1000, packed)
        t4k, t1k = timeit(f4k), timeit(f1k)
        t_step = (t4k - t1k) / 3000
        rec, _ = jax.block_until_ready(f4k())
        err = onpath_mm_from_kernel_rec(np.asarray(rec),
                                            ref_np[:, 0:2])
        res[packed] = (t_step, err)
        name = "packed" if packed else "fast_select(prod)"
        print(f"fused K=1024 {name}: {t_step * 1e6:.2f} us/step device, "
              f"on-path mean {err:.2f} mm", flush=True)
    speedup = res[False][0] / res[True][0]
    print(f"fused K=1024: packed is {speedup:.3f}x vs production "
          f"({res[False][0] * 1e6:.2f} -> {res[True][0] * 1e6:.2f} us/step)",
          flush=True)
    out["fused_K1024"] = {
        "prod_us": round(res[False][0] * 1e6, 2),
        "packed_us": round(res[True][0] * 1e6, 2),
        "speedup": round(speedup, 3),
        "prod_onpath_mm": round(res[False][1], 2),
        "packed_onpath_mm": round(res[True][1], 2)}


def solve_k65536_ab(arm, ref, out):
    # chained two-length fit (the tpu_fastsel_ab.py methodology): the axon
    # tunnel adds ~25-30 ms FIXED dispatch per program, so single-invocation
    # timing is overhead-dominated at this kernel's ~750 us scale
    from mppi_robotarm_tpu.ops import pallas_rollout as pr
    cfg = dataclasses.replace(MPPIConfig(), num_samples=65536, horizon=50)
    window, valid = slice_window(ref, 0, cfg.search_idx_len)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def make_chain(n, packed):
        def chain():
            def body(c, _):
                u, seed = c
                w_eps, s, _ = pr.pallas_solve_core(
                    arm, cfg, x0, u, window, nvalid, seed=seed, step=seed,
                    fuse_update=True, emit_eps=False, unroll_t=True,
                    packed_select=packed)
                return (w_eps, seed + 1), s[0:8]
            (u_f, _), ss = jax.lax.scan(
                body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
            return u_f, ss
        return jax.jit(chain)

    res = {}
    for packed in (False, True):
        t64 = timeit(make_chain(64, packed))
        t16 = timeit(make_chain(16, packed))
        t = (t64 - t16) / 48
        res[packed] = t
        name = "packed" if packed else "fast_select(prod)"
        print(f"solve K=65536 {name}: {t * 1e6:.1f} us/solve device "
              f"({1 / t:,.0f} solves/s)", flush=True)
    speedup = res[False] / res[True]
    print(f"solve K=65536: packed is {speedup:.3f}x vs production",
          flush=True)
    out["solve_K65536"] = {
        "prod_us": round(res[False] * 1e6, 1),
        "packed_us": round(res[True] * 1e6, 1),
        "speedup": round(speedup, 3)}


def main():
    print("devices:", jax.devices(), flush=True)
    arm, sim = ArmParams(), SimConfig()
    ref = jnp.asarray(synth_circle_path(8000))
    out = {}
    fused_loop_ab(arm, sim, ref, np.asarray(ref), out)
    solve_k65536_ab(arm, ref, out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
