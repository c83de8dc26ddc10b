"""On-chip bitwise equivalence of the sublane-stacked fleet kernel.

Runs the same B scenarios (PRNG mode, per-scenario seeds) through the
whole-loop kernel with group=1 (one scenario per grid program) and group=8
(8 scenarios stacked into the vreg sublane rows, ops/pallas_sim.py
`_sim_kernel_stacked`) and asserts the full record arrays and final warm
starts are bit-identical — the stacked layout performs the same lane-width
ops in the same order per scenario, so this must hold exactly, not just
statistically.

    python tools/tpu_stacked_bitwise.py [B] [steps]
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mppi_robotarm_tpu.config import ArmParams, MPPIConfig, SimConfig  # noqa: E402
from mppi_robotarm_tpu.ops.pallas_sim import pallas_sim_run_batched  # noqa: E402
from mppi_robotarm_tpu.sim.paths import synth_circle_path  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    arm, sim = ArmParams(), SimConfig()
    cfg = dataclasses.replace(MPPIConfig(), num_samples=128, horizon=30)
    ref = jnp.asarray(synth_circle_path(2000))
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(np.tile([1.1522, -1.2661], (B, 1))
                     + rng.normal(scale=0.01, size=(B, 2)), jnp.float32)
    dq0 = jnp.zeros((B, 2), jnp.float32)
    up = jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32), (B, 30, 1))
    args = (arm, cfg, sim, ref, q0, dq0, up, jnp.zeros(B, jnp.int32),
            jnp.arange(100, 100 + B, dtype=jnp.int32), steps)
    print("devices:", jax.devices(), flush=True)
    out = {}
    for g in (1, 8):
        f = jax.jit(lambda g=g: pallas_sim_run_batched(
            *args, unroll_t=True, group=g))
        rec, ufin = jax.block_until_ready(f())
        out[g] = (np.asarray(rec), np.asarray(ufin))
    rec_eq = np.array_equal(out[1][0], out[8][0])
    ufin_eq = np.array_equal(out[1][1], out[8][1])
    print(f"stacked(group=8) vs group=1, PRNG mode, {B}x{steps} steps: "
          f"records bitwise equal = {rec_eq}, u_final equal = {ufin_eq}",
          flush=True)
    assert rec_eq and ufin_eq


if __name__ == "__main__":
    main()
