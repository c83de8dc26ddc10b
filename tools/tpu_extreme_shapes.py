"""Extreme-shape smoke test: the VMEM-aware K-tile picker must produce
shapes that Mosaic can actually allocate (round-1 W4).

Runs one key-mode solve at stress shapes — huge K, long horizons (both
above and below the unroll threshold), long filter windows — and asserts
finite outputs.  A tile-picker bug here fails with a Mosaic allocation
error rather than a wrong answer.

Usage: python tools/tpu_extreme_shapes.py
"""

import sys
import time
import dataclasses

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import mppi_robotarm_tpu as m  # noqa: E402
from mppi_robotarm_tpu.config import ArmParams, MPPIConfig  # noqa: E402
from mppi_robotarm_tpu.mppi.solver import MPPIState, solve  # noqa: E402
from mppi_robotarm_tpu.ops.pallas_rollout import _pick_tile  # noqa: E402


def main():
    arm = ArmParams()
    ref = jnp.asarray(m.synth_circle_path(2000), jnp.float32)
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)
    shapes = [
        (65536, 50),    # BASELINE config 3
        (65536, 200),   # long horizon, beyond the unroll threshold
        (8192, 500),    # very long horizon forces small tiles
        (131072, 100),  # 128k samples
        (1024, 30),     # reference-adjacent sanity
    ]
    for k, t in shapes:
        cfg = dataclasses.replace(MPPIConfig(), num_samples=k, horizon=t)
        tile = _pick_tile(-(-k // 128) * 128, t)
        t0 = time.perf_counter()
        st = MPPIState(
            u_prev=jnp.tile(jnp.asarray(cfg.warm_start, jnp.float32),
                            (t, 1)),
            wp_idx=jnp.asarray(0, jnp.int32))
        res = solve(arm, cfg, ref, x0, st, key=jax.random.PRNGKey(1),
                    backend="pallas")
        jax.block_until_ready(res.u0)
        ok = bool(np.all(np.isfinite(np.asarray(res.u_seq))))
        vmem_mb = 3 * 2 * t * tile * 4 / (1 << 20)
        print(f"K={k:7d} T={t:4d} tile={tile:5d} (~{vmem_mb:5.1f} MB noise "
              f"bufs): finite={ok} "
              f"({time.perf_counter() - t0:.1f}s incl. compile)", flush=True)
        assert ok


if __name__ == "__main__":
    main()
