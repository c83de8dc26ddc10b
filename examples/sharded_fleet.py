"""Example: a scenario fleet sharded over a ('data', 'samples') device mesh.

Demonstrates the multi-chip API (MULTICHIP.md) end-to-end.  Runs anywhere:
on a machine without multiple accelerators it forces 8 virtual CPU devices,
so the same program (shard_map + pmin/psum collectives, fused kernel per
shard) that would run on a pod slice executes locally.

    python examples/sharded_fleet.py [batch] [steps]
"""

import os
import sys

# Default: demonstrate on 8 virtual CPU devices.  Set SHARDED_FLEET_TPU=1
# to run on real accelerators instead.
_USE_TPU = os.environ.get("SHARDED_FLEET_TPU", "") == "1"
if not _USE_TPU:
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses
import time

import numpy as np
import jax

if not _USE_TPU:
    # some environments force-register an accelerator backend via
    # sitecustomize; pin CPU before first backend use
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import mppi_robotarm_tpu as m
from mppi_robotarm_tpu.parallel.mesh import initialize_multihost, make_mesh
from mppi_robotarm_tpu.parallel.sharded import (
    make_sharded_fleet,
    make_sharded_sim_step,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    initialize_multihost()                    # no-op on a single host
    n = len(jax.devices())
    samples_ax = 2 if n % 2 == 0 else 1
    mesh = make_mesh(samples=samples_ax)
    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"devices: {n} ({jax.devices()[0].platform}); "
          f"mesh {n // samples_ax}x{samples_ax} (data x samples)")

    arm, cfg, sim = m.circle_tracking_preset()
    cfg = dataclasses.replace(cfg, num_samples=64 * samples_ax, horizon=12)
    step_fn = make_sharded_sim_step(
        arm, cfg, sim, mesh, backend="pallas",
        noise="prng" if on_tpu else "threefry", interpret=not on_tpu)

    ref = jnp.asarray(m.synth_circle_path(2000), jnp.float32)
    q = jnp.tile(jnp.asarray([sim.q0], jnp.float32), (batch, 1))
    dq = jnp.zeros((batch, 2), jnp.float32)
    u_prev = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                      (batch, cfg.horizon, 1))
    wp_idx = jnp.zeros((batch,), jnp.int32)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        keys = jax.random.key_data(
            jax.vmap(lambda s: jax.random.fold_in(sub, s))(
                jnp.arange(batch))).astype(jnp.uint32)
        q, dq, u_prev, wp_idx, done, u0 = step_fn(ref, q, dq, u_prev,
                                                  wp_idx, keys)
    jax.block_until_ready(q)
    wall = time.perf_counter() - t0

    ee_x = np.cos(np.asarray(q[:, 0])) + np.cos(np.asarray(q).sum(1))
    ee_y = np.sin(np.asarray(q[:, 0])) + np.sin(np.asarray(q).sum(1))
    ref_np = np.asarray(ref)
    d = np.linalg.norm(
        np.stack([ee_x, ee_y], 1)[:, None, :] - ref_np[None, :, 0:2],
        axis=2).min(axis=1)
    print(f"{batch} scenarios x {steps} steps in {wall:.2f}s "
          f"({batch * steps / wall:.0f} scenario-solves/s incl. dispatch)")
    print(f"on-path EE error after {steps} steps: median "
          f"{np.median(d) * 1e3:.1f} mm, p95 {np.percentile(d, 95) * 1e3:.1f} mm")
    print(f"wp_idx range: {int(np.min(np.asarray(wp_idx)))}.."
          f"{int(np.max(np.asarray(wp_idx)))}; any done: "
          f"{bool(np.any(np.asarray(done)))}")

    # ---- the zero-collective fleet program -----------------------------
    # When scenarios outnumber chips, shard them over a pure-'data' mesh
    # and run each shard's WHOLE loop in one fused-kernel launch (the
    # sublane-stacked kernel at K <= 128) - no collectives at all.
    fleet_mesh = make_mesh(samples=1)
    cfg_f = dataclasses.replace(cfg, num_samples=128)
    fleet = make_sharded_fleet(arm, cfg_f, sim, fleet_mesh, steps,
                               interpret=not on_tpu)
    q0 = jnp.tile(jnp.asarray([sim.q0], jnp.float32), (batch, 1))
    seeds = jnp.arange(batch, dtype=jnp.int32)
    step0 = jnp.zeros(batch, jnp.int32)
    eps = (None if on_tpu else
           jnp.asarray(np.random.default_rng(0).normal(
               size=(batch, steps, 128, cfg.horizon, 2)) * np.sqrt(20.0),
               jnp.float32))
    t0 = time.perf_counter()
    rec, ufin = fleet(ref, q0, jnp.zeros((batch, 2), jnp.float32),
                      jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                               (batch, cfg.horizon, 1)),
                      jnp.zeros(batch, jnp.int32), seeds, step0, eps=eps)
    jax.block_until_ready(rec)
    wall_f = time.perf_counter() - t0
    print(f"fleet (whole-loop kernel, zero collectives): {batch} x {steps} "
          f"steps in {wall_f:.2f}s ({batch * steps / wall_f:.0f} "
          f"scenario-solves/s incl. compile+dispatch)")


if __name__ == "__main__":
    main()
