"""On-chip A/B of the round-3 waypoint-scan optimization (unmasked leaves).

The tournament argmin in _tracking_cost used to spend one vector select per
window leaf masking truncated rows with +inf.  Clamped windows + strict-<
first-win ties make that mask VALUE-IDENTICAL to no mask (see the
_tracking_cost docstring), so round 3 removed it from the hot path.  This
tool A/Bs the two variants in one process on the real chip — same-day,
same-tunnel numbers — and asserts the kernel outputs are bit-identical on
hardware, not just in interpret mode.

    python tools/tpu_mask_ablate.py
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
from mppi_robotarm_tpu.ops import pallas_rollout as pr  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_sim as ps  # noqa: E402
from mppi_robotarm_tpu.ops.waypoint import slice_window  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402

ORIG = pr._tracking_cost


def set_masked(masked: bool):
    f = ORIG if not masked else functools.partial(ORIG, masked=True)
    pr._tracking_cost = f
    ps._tracking_cost = f          # pallas_sim imported it by name


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
    out = {}

    # --- per-step solve kernel at K=65536 (the waypoint-scan-bound shape) --
    cfg = dataclasses.replace(MPPIConfig(), num_samples=65536, horizon=50)
    window, valid = slice_window(ref, 0, cfg.search_idx_len)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def make_chain(n):
        def chain():
            def body(c, _):
                u, seed = c
                w_eps, s, _ = pr.pallas_solve_core(
                    arm, cfg, x0, u, window, nvalid, seed=seed, step=seed,
                    fuse_update=True, emit_eps=False, unroll_t=True)
                return (w_eps, seed + 1), s[0:8]
            (u_f, _), ss = jax.lax.scan(
                body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
            return u_f, ss
        return jax.jit(chain)

    res = {}
    for masked in (True, False):
        set_masked(masked)
        f64_, f16_ = make_chain(64), make_chain(16)
        t64, t16 = timeit(f64_), timeit(f16_)
        t_solve = (t64 - t16) / 48
        u_f, ss = jax.block_until_ready(f64_())
        res[masked] = (t_solve, np.asarray(u_f), np.asarray(ss))
        print(f"K=65536 masked={masked}: {t_solve * 1e6:.1f} us/solve "
              f"device", flush=True)
    assert np.array_equal(res[True][1], res[False][1]), "u_final differs!"
    assert np.array_equal(res[True][2], res[False][2]), "costs differ!"
    speedup = res[True][0] / res[False][0]
    print(f"K=65536: outputs BITWISE-identical on chip; unmasked is "
          f"{speedup:.3f}x ({res[True][0] * 1e6:.1f} -> "
          f"{res[False][0] * 1e6:.1f} us/solve)", flush=True)
    out["per_step_K65536"] = {
        "masked_us": round(res[True][0] * 1e6, 1),
        "unmasked_us": round(res[False][0] * 1e6, 1),
        "speedup": round(speedup, 3), "bitwise": True}

    # --- fused whole-loop kernel at K=1024 (the headline shape) -----------
    cfg2 = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
    dq0 = jnp.zeros(2, jnp.float32)
    up = jnp.tile(jnp.asarray(cfg2.warm_start, jnp.float32),
                  (cfg2.horizon, 1))

    def make_run(n):
        def run():
            rec, ufin = ps.pallas_sim_run(
                arm, cfg2, sim, ref, q0, dq0, up, 0,
                jnp.asarray(7, jnp.int32), n, unroll_t=True)
            return rec, ufin
        return jax.jit(run)

    res2 = {}
    for masked in (True, False):
        set_masked(masked)
        f4k, f1k = make_run(4000), make_run(1000)
        t4k, t1k = timeit(f4k), timeit(f1k)
        t_step = (t4k - t1k) / 3000
        rec, ufin = jax.block_until_ready(f4k())
        res2[masked] = (t_step, np.asarray(rec), np.asarray(ufin))
        print(f"fused K=1024 masked={masked}: {t_step * 1e6:.2f} us/step "
              f"device", flush=True)
    set_masked(False)
    assert np.array_equal(res2[True][1], res2[False][1]), "records differ!"
    assert np.array_equal(res2[True][2], res2[False][2]), "u_final differs!"
    speedup = res2[True][0] / res2[False][0]
    print(f"fused K=1024: records BITWISE-identical on chip; unmasked is "
          f"{speedup:.3f}x ({res2[True][0] * 1e6:.2f} -> "
          f"{res2[False][0] * 1e6:.2f} us/step)", flush=True)
    out["fused_K1024"] = {
        "masked_us": round(res2[True][0] * 1e6, 2),
        "unmasked_us": round(res2[False][0] * 1e6, 2),
        "speedup": round(speedup, 3), "bitwise": True}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
