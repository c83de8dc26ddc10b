"""MEASURED VPU issue-rate / utilization for the hot kernels (round-3 #4).

DESIGN.md argues the fused loop is VPU/latency-bound (no matmul, analytic
2x2 inverse) and that K=65536 is waypoint-scan compute-bound; this tool
replaces the argument with a measurement:

1. **Device time**: two-chain-length fits (dispatch constant removed) of
   (a) the fused whole-loop kernel at K=1024, H=50 (µs/step) and
   (b) the per-step fused solve kernel chained on-device at K=65536
   (µs/solve).
2. **Counted work**: the rollout inner iteration — the body that executes
   T times per solve and dominates both kernels — is traced as a pure-array
   replica of ops/pallas_sim's `roll` body via `jax.make_jaxpr`, and its
   vector ops are counted per class (simple ALU vs transcendental).  The
   count is per (8,128) f32 vreg of samples.
3. **Sustained issue rate**: vreg-ops/cycle = count x T x (K/1024) /
   (t x f_clock), reported against candidate VLIW vector-issue widths.

Clock assumption: TPU v5e (lite) peak 197 bf16 TFLOP/s with 4 128x128 MXUs
=> f = 197e12 / (4 * 128 * 128 * 2) = 1.50 GHz.  The MXU-derived TensorCore
clock is the VPU clock.  Only the rollout body is counted — the per-step
phases (noise generation, softmax, median filter, scalar waypoint scan) are
uncounted, so the utilization figures are LOWER bounds.

    python tools/tpu_roofline.py
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
from mppi_robotarm_tpu.ops.pallas_rollout import (  # noqa: E402
    _dynamics_step_trig, _tracking_cost)

F_CLOCK = 1.50e9          # see module docstring
TRANSCENDENTAL = {"sin", "cos", "exp", "log", "tanh", "rsqrt", "sqrt",
                  "atan2", "erf", "logistic"}


class _Win:
    """win_ref stand-in: python-float scalar loads, like SMEM scalars."""

    def __init__(self, w):
        self._w = w

    def __getitem__(self, idx):
        j, k = idx
        return self._w[j][k]


def rollout_iter_replica(cfg: MPPIConfig, arm: ArmParams,
                         fast_select: bool = False):
    """Pure-array replica of ops/pallas_sim._sim_kernel's `roll` body (G=1).

    Kept in sync by hand with pallas_sim.py — it calls the REAL
    _dynamics_step_trig and _tracking_cost, so only the ~10 lines of
    glue (v mixing, FK carry, gamma term) are duplicated for tracing.
    """
    W = cfg.search_idx_len
    win = _Win([[0.01 * j, 0.02 * j, 0.3, 0.4] for j in range(W)])
    nvalid = float(W)
    dt_c = jnp.float32(cfg.delta_t)
    stage_w = tuple(jnp.float32(w) for w in cfg.stage_cost_weight)
    si = (0.05, 0.0, 0.0, 0.05)
    gamma = jnp.float32(cfg.gamma)

    def body(q1, q2, dq1, dq2, s, c1, s1v, c12, s12,
             e1, e2, u1r, u2r, exploit):
        v1 = jnp.where(exploit, u1r + e1, e1)
        v2 = jnp.where(exploit, u2r + e2, e2)
        c2 = c12 * c1 + s12 * s1v
        s2v = s12 * c1 - c12 * s1v
        q1, q2, dq1, dq2 = _dynamics_step_trig(
            q1, q2, dq1, dq2, v1, v2, dt_c, arm, c1, c2, s2v, c12)
        c1 = jnp.cos(q1)
        s1v = jnp.sin(q1)
        q12 = q1 + q2
        c12 = jnp.cos(q12)
        s12 = jnp.sin(q12)
        x = cfg.l1 * c1 + cfg.l2 * c12
        y = cfg.l1 * s1v + cfg.l2 * s12
        s = s + _tracking_cost(q1, q2, dq1, dq2, win, nvalid, *stage_w,
                               cfg=cfg, window_len=W, unroll=True, xy=(x, y),
                               fast_select=fast_select)
        su1 = si[0] * u1r + si[1] * u2r
        su2 = si[2] * u1r + si[3] * u2r
        s = s + gamma * (v1 * su1 + v2 * su2)
        return q1, q2, dq1, dq2, s, c1, s1v, c12, s12

    return body


def count_vreg_ops(cfg, arm, shape=(8, 128), fast_select=False):
    body = rollout_iter_replica(cfg, arm, fast_select=fast_select)
    args = [jnp.zeros(shape, jnp.float32)] * 13 + [
        jnp.zeros(shape, bool)]
    jaxpr = jax.make_jaxpr(body)(*args)
    n = shape[0] * shape[1]
    simple = trans = 0
    for eqn in jaxpr.jaxpr.eqns:
        out = eqn.outvars[0].aval
        if getattr(out, "size", 0) != n:
            continue                      # scalar/const folding, not a vreg op
        if eqn.primitive.name in TRANSCENDENTAL:
            trans += 1
        elif eqn.primitive.name == "integer_pow":
            simple += 2
        else:
            simple += 1
    return simple, trans


def fit_two_lengths(run, n_long, n_short, reps=3):
    def t(n):
        jax.block_until_ready(run(n))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t_long, t_short = t(n_long), t(n_short)
    slope = (t_long - t_short) / (n_long - n_short)
    return slope, t_long - slope * n_long


def main():
    from mppi_robotarm_tpu import (benchmark_preset, init_sim,
                                   simulate_fused, synth_circle_path)
    from mppi_robotarm_tpu.ops.pallas_rollout import pallas_solve_core
    from mppi_robotarm_tpu.ops.waypoint import slice_window

    print("devices:", jax.devices(), flush=True)
    arm, cfg, sim = benchmark_preset()        # K=1024, H=50
    ref = jnp.asarray(synth_circle_path(8000))
    simple, trans = count_vreg_ops(cfg, arm)
    fsimple, ftrans = count_vreg_ops(cfg, arm, fast_select=True)
    print(f"rollout iteration: {simple} simple + {trans} transcendental "
          f"vreg-ops per (8,128) tile (T={cfg.horizon} iterations/solve); "
          f"fast_select variant (per-step PRNG kernels): {fsimple} + "
          f"{ftrans}", flush=True)
    out = {"per_iter_simple": simple, "per_iter_transcendental": trans,
           "per_iter_simple_fast_select": fsimple,
           "f_clock_ghz": F_CLOCK / 1e9}

    # --- fused whole-loop kernel, K=1024 --------------------------------
    state0 = init_sim(cfg, sim, jax.random.PRNGKey(0))
    run = lambda n: simulate_fused(arm, cfg, sim, ref, state0, n)
    slope, fixed = fit_two_lengths(run, 4000, 1000)
    t_step = slope
    vregs = cfg.num_samples // 1024           # (8,128) tiles per vector op
    ops = (simple + trans) * cfg.horizon * vregs
    cycles = t_step * F_CLOCK
    rate = ops / cycles
    print(f"[fused K=1024] {t_step * 1e6:.2f} us/step device "
          f"(fixed dispatch {fixed * 1e3:.1f} ms); rollout-counted "
          f"{ops} vreg-ops/step over {cycles:,.0f} cycles -> sustained "
          f"{rate:.2f} vector ops/cycle "
          f"({100 * rate / 4:.0f}% of a 4-slot ceiling, "
          f"{100 * rate:.0f}% of 1-slot)", flush=True)
    out["fused_K1024"] = {"us_per_step": round(t_step * 1e6, 2),
                          "ops_per_step_counted": ops,
                          "sustained_ops_per_cycle": round(rate, 3)}

    # --- per-step solve kernel, K=65536 ---------------------------------
    cfg_big = dataclasses.replace(cfg, num_samples=65536)
    window, valid = slice_window(ref, 0, cfg.search_idx_len)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def chain(n):                      # n is a static scan length
        def body(c, _):
            u, seed = c
            w_eps, s, _ = pallas_solve_core(
                arm, cfg_big, x0, u, window, nvalid, seed=seed,
                step=seed, fuse_update=True, emit_eps=False,
                unroll_t=True)
            return (w_eps, seed + 1), s[0]
        (_, _), ss = jax.lax.scan(
            body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
        return ss

    # scan length is static: jit per length, fit across the two programs
    f_long = jax.jit(lambda: chain(64)).lower().compile()
    f_short = jax.jit(lambda: chain(16)).lower().compile()
    for f in (f_long, f_short):
        jax.block_until_ready(f())
    ts = {}
    for name, f, n in (("long", f_long, 64), ("short", f_short, 16)):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    t_solve = (ts["long"] - ts["short"]) / (64 - 16)
    vregs = cfg_big.num_samples // 1024
    # the chained PRNG-mode solve runs the fast_select leaves
    ops = (fsimple + ftrans) * cfg.horizon * vregs
    cycles = t_solve * F_CLOCK
    rate = ops / cycles
    print(f"[per-step K=65536] {t_solve * 1e6:.1f} us/solve device; "
          f"rollout-counted {ops} vreg-ops/solve over {cycles:,.0f} cycles "
          f"-> sustained {rate:.2f} vector ops/cycle "
          f"({100 * rate / 4:.0f}% of a 4-slot ceiling)", flush=True)
    out["per_step_K65536"] = {"us_per_solve": round(t_solve * 1e6, 1),
                              "ops_per_solve_counted": ops,
                              "sustained_ops_per_cycle": round(rate, 3)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
