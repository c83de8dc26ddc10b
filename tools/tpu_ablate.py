"""Ablation probe: which part of the fused kernel dominates latency?

Varies horizon T, window length W, and PRNG on/off independently at K=1024
and fits the observed per-solve time.
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
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    print("devices:", jax.devices())
    arm = ArmParams()
    ref_path = jnp.asarray(synth_circle_path(2000))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    rng = np.random.default_rng(0)

    cases = [
        ("T=50 W=30 prng", 50, 30, True),
        ("T=25 W=30 prng", 25, 30, True),
        ("T=50 W=15 prng", 50, 15, True),
        ("T=50 W=5  prng", 50, 5, True),
        ("T=50 W=30 eps-in", 50, 30, False),
    ]
    for name, T, W, use_prng in cases:
        cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=T,
                                  search_idx_len=W)
        window, valid = slice_window(ref_path, 0, W)
        nvalid = jnp.sum(valid.astype(jnp.float32))
        u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (T, 1))
        if use_prng:
            def fn(carry, cfg=cfg, window=window, nvalid=nvalid):
                u, seed = carry
                w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window,
                                                nvalid,
                                                seed=seed.astype(jnp.int32))
                return (u + 1e-6 * w_eps, seed + 1)
        else:
            eps = jnp.asarray(rng.normal(size=(1024, T, 2)), jnp.float32)
            def fn(carry, cfg=cfg, window=window, nvalid=nvalid, eps=eps):
                u, seed = carry
                w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window,
                                                nvalid, eps=eps)
                return (u + 1e-6 * w_eps, seed + 1)
        per = time_chain(fn, (u0, jnp.asarray(0, jnp.int32)))
        print(f"{name}: {per*1e6:7.1f} us/solve ({1/per:7.0f}/s)", flush=True)


if __name__ == "__main__":
    main()
