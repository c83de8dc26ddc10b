"""On-chip A/B of the reduced waypoint-selection metric (round 4).

The tournament leaves used to compute the exact reference metric
d_j = ((x−wx_j)² + (y−wy_j)²)·dist_scale — 6 vector ops per leaf.
``fast_select`` expands the square and drops the sample-constant x²+y² and
the positive dist_scale (both monotone in the argmin):
score_j = −2wx_j·x − 2wy_j·y + (wx_j²+wy_j²) — 4 vector ops, with the
row-constant coefficients on the scalar core.  W=30 leaves × T=50 steps
makes this the single largest op-count item in the rollout (DESIGN.md
item 11: the window tournament is ~83% of counted rollout ops).

Production (on-chip PRNG) mode uses it by default; the injected-eps parity
seam keeps the exact metric.  This tool A/Bs both in one process on the
real chip in PRNG mode via the explicit override, at the K=65536 extreme
shape and the K=1024 shape, and checks the values: selection differs only
on fp near-ties, so S agrees to ~1e-5 relative on a single solve.

    python tools/tpu_fastsel_ab.py
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

    def make_chain(n, fs):
        def chain():
            def body(c, _):
                u, seed = c
                w_eps, s, _ = pr.pallas_solve_core(
                    arm, cfg, x0, u, window, nvalid, seed=seed, step=seed,
                    fuse_update=True, emit_eps=False, unroll_t=True,
                    fast_select=fs)
                return (w_eps, seed + 1), s[0:8]
            (u_f, _), ss = jax.lax.scan(
                body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
            return u_f, ss
        return jax.jit(chain)

    res = {}
    for fs in (False, True):
        t64 = timeit(make_chain(64, fs))
        t16 = timeit(make_chain(16, fs))
        res[fs] = (t64 - t16) / 48
        print(f"K={k} fast_select={fs}: {res[fs] * 1e6:.1f} us/solve device",
              flush=True)

    # value gate: single PRNG-mode solve per variant, same seed ⇒ same noise
    vals = {}
    for fs in (False, True):
        u_new, s, _ = pr.pallas_solve_core(
            arm, cfg, x0, u0, window, nvalid,
            seed=jnp.asarray(11, jnp.int32), fuse_update=True,
            emit_eps=False, unroll_t=True, fast_select=fs)
        vals[fs] = (np.asarray(s), np.asarray(u_new))
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
        "exact_us": round(res[False] * 1e6, 1),
        "fast_select_us": round(res[True] * 1e6, 1),
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
