"""Ablation probe for the FUSED closed-loop kernel (ops/pallas_sim.py).

Varies horizon T, window W, filter width, noise mode, and unrolling on the
whole-loop kernel itself (1000 in-kernel steps, single launch) to attribute
the per-step latency to kernel phases.  The headline bench (bench.py) runs
this kernel; tools/tpu_ablate.py probes the per-step solve kernel instead,
where fixed dispatch overhead (~290 us/launch via the axon tunnel) swamps
the in-kernel differences.
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig
    from mppi_robotarm_tpu.ops.pallas_sim import pallas_sim_run
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    print("devices:", jax.devices())
    arm = ArmParams()
    ref_path = jnp.asarray(synth_circle_path(4000))
    q0 = jnp.asarray([1.1522, -1.2661], jnp.float32)
    dq0 = jnp.zeros(2, jnp.float32)
    sim = SimConfig()
    n_steps = 1000
    rng = np.random.default_rng(0)

    base = dict(num_samples=1024, horizon=50, search_idx_len=30,
                filter_window=10)
    cases = [
        ("base T=50 W=30 fw=10 prng unroll", {}, True, True),
        ("T=25", {"horizon": 25}, True, True),
        ("T=12", {"horizon": 12}, True, True),
        ("W=5", {"search_idx_len": 5}, True, True),
        ("fw=2", {"filter_window": 2}, True, True),
        ("eps-injected (no PRNG)", {}, False, True),
        ("K=128", {"num_samples": 128}, True, True),
        ("K=2048", {"num_samples": 2048}, True, True),
    ]
    for name, over, use_prng, unroll in cases:
        cfg = dataclasses.replace(MPPIConfig(), **{**base, **over})
        T = cfg.horizon
        u0 = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (T, 1))
        # injected noise goes in as a jit ARGUMENT — closing over it would
        # bake a ~400 MB constant into the program (HTTP 413 on the remote
        # compile tunnel)
        eps = (None if use_prng else
               jnp.asarray(rng.normal(size=(n_steps, cfg.num_samples, T, 2)),
                           jnp.float32))

        @jax.jit
        def run(e):
            return pallas_sim_run(arm, cfg, sim, ref_path, q0, dq0, u0,
                                  0, 42, n_steps, eps=e, unroll_t=unroll)

        out = jax.block_until_ready(run(eps))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(eps))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / n_steps
        rec = np.asarray(out[0])
        note = "" if np.isfinite(rec[:, :6]).all() else "  [non-finite rec]"
        print(f"{name:36s}: {per*1e6:7.1f} us/step ({1/per:7.0f}/s){note}",
              flush=True)


if __name__ == "__main__":
    main()
