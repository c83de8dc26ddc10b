"""Kernel tuning sweep on the chip: unroll factors, kernel-only vs full solve.

    python tools/tpu_tune.py

Times (dispatch-amortised, 100-solve on-device chains):
  * the raw fused kernel alone (pallas_solve_core),
  * the full solve (kernel + waypoint update + median filter + shift),
  * across (unroll_t, unroll_w) variants,
at the north-star shape K=1024, H=50.
"""

import sys
import time
import dataclasses
import functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def time_chain(fn, init_carry, n=100, reps=3):
    @jax.jit
    def chain(c):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c
    jax.block_until_ready(chain(init_carry))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(init_carry))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    from mppi_robotarm_tpu.config import ArmParams, MPPIConfig
    from mppi_robotarm_tpu.ops.pallas_rollout import pallas_solve_core
    from mppi_robotarm_tpu.ops.waypoint import slice_window
    from mppi_robotarm_tpu.ops.filters import median_filter_reflect
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    print("devices:", jax.devices())
    arm = ArmParams()
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    ref_path = jnp.asarray(synth_circle_path(2000))
    window, valid = slice_window(ref_path, 0, cfg.search_idx_len)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (cfg.horizon, 1))

    for ut, uw in [(False, False), (False, True), (True, False), (True, True)]:
        core = functools.partial(pallas_solve_core, arm, cfg,
                                 unroll_t=ut, unroll_w=uw)

        def kernel_only(carry):
            u, seed = carry
            w_eps, s, _ = core(x0, u, window, nvalid,
                               seed=seed.astype(jnp.int32))
            return (u + 1e-6 * w_eps, seed + 1)

        t0 = time.perf_counter()
        per = time_chain(kernel_only, (u0, jnp.asarray(0, jnp.int32)))
        compile_s = time.perf_counter() - t0
        print(f"unroll_t={ut!s:5} unroll_w={uw!s:5}: kernel-only "
              f"{per*1e6:7.1f} us/solve ({1/per:7.0f}/s)  "
              f"[first-call {compile_s:.1f}s]", flush=True)

    # best-config full solve (kernel + median + shift)
    def full_solve(carry):
        u, seed = carry
        w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window, nvalid,
                                        seed=seed.astype(jnp.int32),
                                        unroll_t=False, unroll_w=True)
        u_new = u + median_filter_reflect(w_eps, cfg.filter_window)
        return (jnp.concatenate([u_new[1:], u_new[-1:]]), seed + 1)

    per = time_chain(full_solve, (u0, jnp.asarray(0, jnp.int32)))
    print(f"full solve (uw=True): {per*1e6:7.1f} us/solve ({1/per:7.0f}/s)")


if __name__ == "__main__":
    main()
