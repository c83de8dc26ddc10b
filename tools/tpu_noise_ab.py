"""On-chip measurement of noise generation's share + one reduction (round-5
item 7).

The roofline analysis says the K=65536 per-step solve kernel's budget
splits between the window tournament and Box-Muller noise (4 transcendental
expansions — log, sqrt, cos, sin — per draw PAIR, pallas_rollout:78-84).
This tool:

1. isolates noise's exact share by monkeypatching ``_box_muller`` with
   (a) a uniforms-only variant (PRNG draws kept, transcendentals removed)
   and (b) a constant fill (everything removed) — the timing deltas are the
   Box-Muller-transcendental and total-noise shares;
2. A/Bs ONE reduction: deriving sin from cos via the Pythagorean identity
   (sinθ = ±sqrt(1−cos²θ), sign from u2 ≤ ½ since θ = 2πu2) — swaps one
   polynomial transcendental for a hardware sqrt + 2 cheap ops.  The
   distribution is IDENTICAL (same (r, θ) stream, sin computed to ulp-level
   difference); moments are asserted on-chip at K=8192.

Both production regimes are measured: the per-step solve kernel at K=65536
(VERDICT target: >= 1,400 solves/s, from 1,328) and the fused whole-loop
kernel at the bench shape (K=1024).

    python tools/tpu_noise_ab.py
"""

import dataclasses
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_rollout as pr  # noqa: E402
from mppi_robotarm_tpu.ops import pallas_sim as ps  # noqa: E402
from mppi_robotarm_tpu.ops.waypoint import slice_window  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402

_TWO_PI = 2.0 * math.pi
ORIG = pr._box_muller
_u = pr._uniform_from_bits


def bm_uniforms_only(shape):
    """PRNG draws kept, transcendentals removed (isolation, NOT production)."""
    u1 = _u(pltpu.prng_random_bits(shape))
    u2 = _u(pltpu.prng_random_bits(shape))
    return u1 - 0.5, u2 - 0.5


def bm_const(shape):
    """No PRNG, no transcendentals (isolation, NOT production)."""
    return (jnp.full(shape, 0.31, jnp.float32),
            jnp.full(shape, -0.17, jnp.float32))


def bm_sqrtsin(shape):
    """Candidate: sin derived from cos via sqrt(1−c²) with the half-turn
    sign (u2 ≤ ½ ⇔ θ ∈ [0, π] ⇔ sin ≥ 0).  Distribution-identical to the
    reference Box-Muller; values differ from jnp.sin at ulp level."""
    u1 = _u(pltpu.prng_random_bits(shape))
    u2 = _u(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c = jnp.cos(_TWO_PI * u2)
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
    s = jnp.where(u2 <= 0.5, s, -s)
    return r * c, r * s


def set_bm(fn):
    pr._box_muller = fn
    ps._box_muller = fn


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # sections selectable so one chip session stays under the wedge-retry
    # budget: moments | solve | fused | all (default all)
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    arm, sim = ArmParams(), SimConfig()
    ref = jnp.asarray(synth_circle_path(8000))
    out = {}

    # ---- moments: sqrtsin must reproduce N(0, Σ) at K=8192 ----------------
    cfg8 = dataclasses.replace(MPPIConfig(), num_samples=8192, horizon=50)
    window, valid = slice_window(ref, 0, cfg8.search_idx_len)
    nvalid = jnp.asarray([np.float32(np.asarray(valid).sum())])
    x0 = jnp.asarray([[1.1522, -1.2661, 0.0, 0.0]], jnp.float32)
    u8 = jnp.tile(jnp.asarray(cfg8.warm_start, jnp.float32),
                  (1, cfg8.horizon, 1))
    for name, fn in (() if section not in ("moments", "all")
                     else (("orig", ORIG), ("sqrtsin", bm_sqrtsin))):
        set_bm(fn)
        _, _, eps, _ = pr.pallas_solve_batched(
            arm, cfg8, x0, u8, window[None], nvalid,
            seed=jnp.asarray([3], jnp.int32), emit_eps=True)
        e = np.asarray(eps).reshape(-1, 2)
        mu, sd = e.mean(axis=0), e.std(axis=0)
        cov = float(np.mean(e[:, 0] * e[:, 1]) - mu[0] * mu[1])
        print(f"moments {name}: mean {mu}, std {sd}, cov12 {cov:.3f} "
              f"(sigma {np.asarray(cfg8.sigma).tolist()})", flush=True)
        assert np.all(np.abs(mu) < 0.1), (name, mu)
        chol = np.linalg.cholesky(np.asarray(cfg8.sigma))
        sd_exp = np.sqrt(np.diag(np.asarray(cfg8.sigma)))
        assert np.allclose(sd, sd_exp, rtol=0.05), (name, sd, sd_exp)
        cov_exp = float(np.asarray(cfg8.sigma)[0, 1])
        assert abs(cov - cov_exp) < 0.5 + 0.05 * abs(cov_exp), (name, cov)

    # ---- per-step solve kernel, K=65536 -----------------------------------
    # chained two-length fit (tpu_fastsel_ab.py methodology): the tunnel's
    # ~25-30 ms fixed dispatch would otherwise swamp the ~750 us kernel
    cfg = dataclasses.replace(MPPIConfig(), num_samples=65536, horizon=50)
    window65, valid65 = slice_window(ref, 0, cfg.search_idx_len)
    nvalid65 = jnp.sum(valid65.astype(jnp.float32))
    x0s = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (cfg.horizon, 1))

    def make_chain(n):
        def chain():
            def body(c, _):
                u_c, seed_c = c
                w_eps, s, _ = pr.pallas_solve_core(
                    arm, cfg, x0s, u_c, window65, nvalid65, seed=seed_c,
                    step=seed_c, fuse_update=True, emit_eps=False,
                    unroll_t=True)
                return (w_eps, seed_c + 1), s[0:8]
            (u_f, _), ss = jax.lax.scan(
                body, (u0, jnp.asarray(0, jnp.int32)), None, length=n)
            return u_f, ss
        return jax.jit(chain)

    res = {}
    variants = (("orig", ORIG), ("uniforms_only", bm_uniforms_only),
                ("const", bm_const), ("sqrtsin", bm_sqrtsin))
    for name, fn in (variants if section in ("solve", "all") else ()):
        set_bm(fn)
        t64 = timeit(make_chain(64))
        t16 = timeit(make_chain(16))
        t = (t64 - t16) / 48
        res[name] = t
        print(f"solve K=65536 {name}: {t * 1e6:.1f} us/solve device "
              f"({1 / t:,.0f} solves/s)", flush=True)
    if res:
        bm_share = (res["orig"] - res["uniforms_only"]) / res["orig"]
        noise_share = (res["orig"] - res["const"]) / res["orig"]
        print(f"K=65536 noise shares: Box-Muller transcendentals "
              f"{bm_share * 100:.1f}%, total noise {noise_share * 100:.1f}%; "
              f"sqrtsin speedup {res['orig'] / res['sqrtsin']:.3f}x",
              flush=True)
        out["solve_K65536"] = {
            "orig_us": round(res["orig"] * 1e6, 1),
            "uniforms_only_us": round(res["uniforms_only"] * 1e6, 1),
            "const_us": round(res["const"] * 1e6, 1),
            "sqrtsin_us": round(res["sqrtsin"] * 1e6, 1),
            "bm_transcendental_share": round(bm_share, 3),
            "total_noise_share": round(noise_share, 3),
            "sqrtsin_speedup": round(res["orig"] / res["sqrtsin"], 3),
            "sqrtsin_solves_per_s": round(1 / res["sqrtsin"], 0)}

    # ---- fused whole-loop kernel, bench shape -----------------------------
    cfg1k = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
    dq0 = jnp.zeros(2, jnp.float32)
    up = jnp.tile(jnp.asarray(cfg1k.warm_start, jnp.float32),
                  (cfg1k.horizon, 1))

    def make_run(n):
        def run():
            return ps.pallas_sim_run(arm, cfg1k, sim, ref, q0, dq0, up, 0,
                                     jnp.asarray(7, jnp.int32), n,
                                     unroll_t=True)
        return jax.jit(run)

    resf = {}
    for name, fn in ((("orig", ORIG), ("uniforms_only", bm_uniforms_only),
                      ("sqrtsin", bm_sqrtsin))
                     if section in ("fused", "all") else ()):
        set_bm(fn)
        t4k, t1k = timeit(make_run(4000)), timeit(make_run(1000))
        t_step = (t4k - t1k) / 3000
        resf[name] = t_step
        print(f"fused K=1024 {name}: {t_step * 1e6:.2f} us/step device",
              flush=True)
    set_bm(ORIG)
    if resf:
        print(f"fused K=1024: BM transcendental share "
              f"{(resf['orig'] - resf['uniforms_only']) / resf['orig'] * 100:.1f}%"
              f"; sqrtsin speedup {resf['orig'] / resf['sqrtsin']:.3f}x",
              flush=True)
        out["fused_K1024"] = {
            "orig_us": round(resf["orig"] * 1e6, 2),
            "uniforms_only_us": round(resf["uniforms_only"] * 1e6, 2),
            "sqrtsin_us": round(resf["sqrtsin"] * 1e6, 2),
            "bm_transcendental_share": round(
                (resf["orig"] - resf["uniforms_only"]) / resf["orig"], 3),
            "sqrtsin_speedup": round(resf["orig"] / resf["sqrtsin"], 3)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
