"""Isolate the WALL-CLOCK COST OF THE THREE COLLECTIVES in the sharded solve.

Round-2 weakness W1: docs/scaling_curve.md's absolute "efficiency" columns on
the 2-core/8-virtual-device CPU mesh measured host-core starvation, not
communication — even the zero-communication data axis read 15-47%.  What CAN
be measured honestly here is a DIFFERENCE: run the sample-sharded solve twice,
once as-is and once with the three collectives (pmin ρ, psum η, psum Σwε)
replaced by their shard-local values (`make_sharded_solve(...,
elide_collectives=True)`) — two programs identical in every shard-local op,
layout, and scheduling constraint except the cross-shard exchanges.  Both
suffer the same core starvation; the gap is the collectives' cost.

    python tools/collective_cost.py [reps]

Prints a markdown table of µs/solve collective overhead per samples-axis
width plus the payload bytes, and a JSON line for the docs.
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig  # noqa: E402
from mppi_robotarm_tpu.parallel.mesh import make_mesh  # noqa: E402
from mppi_robotarm_tpu.parallel.sharded import make_sharded_solve  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402


def time_fn(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)              # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    arm = ArmParams()
    cfg = dataclasses.replace(MPPIConfig(), num_samples=4096, horizon=50)
    ref = jnp.asarray(synth_circle_path(2000))
    B = 1
    obs = jnp.tile(jnp.asarray([[1.1522, -1.2661, 0.0, 0.0]], jnp.float32),
                   (B, 1))
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                  (B, cfg.horizon, 1))
    wp = jnp.zeros((B,), jnp.int32)
    rng = np.random.default_rng(0)
    eps = jnp.asarray(rng.normal(size=(B, cfg.num_samples, cfg.horizon, 2))
                      * np.sqrt(20.0), jnp.float32)
    # per solve: pmin(f32) + psum(f32) + psum((T,2) f32), each an
    # all-reduce over the samples axis
    payload = 4 + 4 + cfg.horizon * 2 * 4

    rows = []
    for n in (2, 4, 8):
        mesh = make_mesh(data=1, samples=n)
        f_coll = make_sharded_solve(arm, cfg, mesh)
        f_free = make_sharded_solve(arm, cfg, mesh, elide_collectives=True)
        args = (ref, obs, up, wp, eps)
        t_coll = time_fn(f_coll, args, reps)
        t_free = time_fn(f_free, args, reps)
        rows.append({
            "samples_axis": n,
            "ms_with_collectives": round(t_coll * 1e3, 3),
            "ms_collectives_elided": round(t_free * 1e3, 3),
            "collective_overhead_us": round((t_coll - t_free) * 1e6, 1),
            "overhead_frac": round(max(0.0, t_coll - t_free) / t_coll, 4),
        })
        print(f"samples={n}: {t_coll * 1e3:.3f} ms with vs "
              f"{t_free * 1e3:.3f} ms without -> "
              f"{(t_coll - t_free) * 1e6:+.1f} us/solve collective cost",
              flush=True)

    print("\n| samples axis | ms/solve (with) | ms/solve (elided) | "
          "collective cost (µs/solve) | fraction |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['samples_axis']} | {r['ms_with_collectives']} | "
              f"{r['ms_collectives_elided']} | "
              f"{r['collective_overhead_us']} | "
              f"{r['overhead_frac'] * 100:.1f}% |")
    print()
    print(json.dumps({"K": cfg.num_samples, "T": cfg.horizon,
                      "payload_bytes_per_solve": payload, "reps": reps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
