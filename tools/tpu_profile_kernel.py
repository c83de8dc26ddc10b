"""Capture a jax.profiler trace of the solve-kernel chain and print the
longest device ops, to locate the fixed ~235us cost inside the fused kernel.
"""

import glob
import gzip
import json
import sys
import dataclasses

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from mppi_robotarm_tpu.config import ArmParams, MPPIConfig
    from mppi_robotarm_tpu.ops.pallas_rollout import pallas_solve_core
    from mppi_robotarm_tpu.ops.waypoint import slice_window
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    print("devices:", jax.devices())
    arm = ArmParams()
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    ref_path = jnp.asarray(synth_circle_path(2000))
    window, valid = slice_window(ref_path, 0, 30)
    nvalid = jnp.sum(valid.astype(jnp.float32))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (50, 1))

    @jax.jit
    def chain(u, seed):
        def body(c, _):
            u, seed = c
            w_eps, s, _ = pallas_solve_core(arm, cfg, x0, u, window, nvalid,
                                            seed=seed.astype(jnp.int32))
            return (u + 1e-6 * w_eps, seed + 1), 0
        (u, seed), _ = jax.lax.scan(body, (u, seed), None, length=50)
        return u

    jax.block_until_ready(chain(u0, jnp.asarray(0, jnp.int32)))
    with jax.profiler.trace("/tmp/jaxtrace"):
        jax.block_until_ready(chain(u0, jnp.asarray(0, jnp.int32)))

    # parse the trace
    files = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz",
                             recursive=True))
    print("trace files:", files)
    if not files:
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # aggregate by name
    agg = {}
    for e in events:
        name = e["name"]
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]
    for name, (cnt, dur) in top:
        print(f"{dur/1e3:9.2f} ms  x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
