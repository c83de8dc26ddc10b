"""Isolate fixed per-invocation cost: trivial pallas kernel vs trivial XLA op
vs the full solve kernel, all in identical 100-iteration on-device scan chains.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_chain(fn, init_carry, n=100, reps=5):
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
    print("devices:", jax.devices())
    x = jnp.ones((8, 128), jnp.float32)

    # 1. trivial XLA op chain
    per = time_chain(lambda c: c * 1.000001 + 0.0000001, x)
    print(f"xla mul chain:            {per*1e6:8.2f} us/iter")

    # 2. trivial pallas kernel chain
    def triv_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...] * 1.000001

    def triv(c):
        return pl.pallas_call(
            triv_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(c)
    per = time_chain(triv, x)
    print(f"trivial pallas chain:     {per*1e6:8.2f} us/iter")

    # 3. pallas with a 400KB scratch + VMEM->HBM output like the solve kernel
    def big_kernel(i_ref, o_ref, big_ref, scratch):
        scratch[...] = jnp.zeros_like(scratch)
        big_ref[...] = scratch[...]
        o_ref[...] = i_ref[...] * 1.000001

    def big(c):
        o, b = pl.pallas_call(
            big_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((100, 8, 128), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((100, 8, 128), jnp.float32)],
        )(c)
        return o + 1e-9 * b[0, 0, 0]
    per = time_chain(big, x)
    print(f"pallas + 400KB out chain: {per*1e6:8.2f} us/iter")

    # 4. the real solve kernel without the eps output consumed
    import dataclasses
    from mppi_robotarm_tpu.config import ArmParams, MPPIConfig
    from mppi_robotarm_tpu.ops.pallas_rollout import pallas_solve_core
    from mppi_robotarm_tpu.ops.waypoint import slice_window
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    arm = ArmParams()
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    ref_path = jnp.asarray(synth_circle_path(2000))
    window, valid = slice_window(ref_path, 0, 30)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (50, 1))

    def fn(carry):
        u, seed = carry
        w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window, nvalid,
                                        seed=seed.astype(jnp.int32))
        return (u + 1e-6 * w_eps, seed + 1)
    per = time_chain(fn, (u0, jnp.asarray(0, jnp.int32)))
    print(f"solve kernel chain:       {per*1e6:8.2f} us/iter")

    def fn2(carry):
        u, seed = carry
        w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window, nvalid,
                                        seed=seed.astype(jnp.int32),
                                        emit_eps=False)
        return (u + 1e-6 * w_eps, seed + 1)
    per = time_chain(fn2, (u0, jnp.asarray(0, jnp.int32)))
    print(f"solve kernel emit_eps=False: {per*1e6:8.2f} us/iter")


if __name__ == "__main__":
    main()
