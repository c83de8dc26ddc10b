"""On-chip validation + microbenchmark of the fused Pallas solve kernel.

Run on the real TPU (takes the chip exclusively):

    python tools/tpu_validate.py

Checks (hardware, not interpreter):
  1. injected-eps parity: pallas backend vs XLA backend, same noise;
  2. hardware-PRNG mode: determinism for equal seeds, N(0, Σ) statistics;
  3. latency: XLA vs Pallas single solve at the north-star shape
     (K=1024, H=50) and the big-sweep shapes K=8192/65536 (BASELINE config 3),
     dispatch-amortised via lax.scan chains of solves.
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


def timed_solve_chain(arm, cfg, ref_path, backend, n_iters=50):
    """Wall time of n_iters chained solves (warm-started, scan on device)."""
    from mppi_robotarm_tpu.mppi.solver import MPPIState, init_state, solve

    state = init_state(cfg)
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)

    @jax.jit
    def chain(u_prev, wp_idx, key):
        def body(carry, _):
            u_prev, wp_idx, key = carry
            key, sub = jax.random.split(key)
            res = solve(arm, cfg, ref_path, x0,
                        MPPIState(u_prev=u_prev, wp_idx=wp_idx), key=sub,
                        backend=backend)
            return (res.state.u_prev, res.state.wp_idx, key), res.u0
        (u_prev, wp_idx, _), u0s = jax.lax.scan(
            body, (u_prev, wp_idx, key), None, length=n_iters)
        return u0s

    args = (state.u_prev, state.wp_idx, jax.random.PRNGKey(0))
    jax.block_until_ready(chain(*args))       # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(*args))
        times.append(time.perf_counter() - t0)
    per_solve = min(times) / n_iters
    return per_solve


def main():
    from mppi_robotarm_tpu.config import ArmParams, MPPIConfig
    from mppi_robotarm_tpu.mppi.solver import init_state, solve
    from mppi_robotarm_tpu.sim.paths import synth_circle_path

    print("devices:", jax.devices())
    arm = ArmParams()
    ref_path = jnp.asarray(synth_circle_path(2000))
    x0 = jnp.asarray([1.1522, -1.2661, 0.0, 0.0], jnp.float32)

    # 1. hardware parity, injected eps
    cfg = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    rng = np.random.default_rng(0)
    eps = (rng.normal(size=(1024, 50, 2)) * np.sqrt(20.0)).astype(np.float32)
    st = init_state(cfg)
    r_x = solve(arm, cfg, ref_path, x0, st, eps=jnp.asarray(eps),
                backend="xla")
    r_p = solve(arm, cfg, ref_path, x0, st, eps=jnp.asarray(eps),
                backend="pallas")
    du = np.abs(np.asarray(r_x.u_seq) - np.asarray(r_p.u_seq)).max()
    ds = np.abs((np.asarray(r_x.costs) - np.asarray(r_p.costs))
                / np.asarray(r_x.costs)).max()
    print(f"1. parity: max|Δu_seq|={du:.3e}  max relΔS={ds:.3e}  "
          f"{'OK' if du < 1e-3 and ds < 1e-4 else 'FAIL'}")

    # 2. PRNG mode
    k = jax.random.PRNGKey(7)
    ra = solve(arm, cfg, ref_path, x0, st, key=k, backend="pallas",
               want_eps=True)
    rb = solve(arm, cfg, ref_path, x0, st, key=k, backend="pallas",
               want_eps=True)
    det = np.array_equal(np.asarray(ra.u_seq), np.asarray(rb.u_seq))
    e = np.asarray(ra.eps).reshape(-1, 2)
    print(f"2. prng: deterministic={det} mean={e.mean():+.4f} "
          f"std={e.std(axis=0)} (want ~[4.472 4.472]) "
          f"{'OK' if det and abs(e.mean()) < 0.1 else 'FAIL'}")

    # 2b. fused-loop PRNG stream continuation: chaining simulate_fused from
    # the returned state must CONTINUE the (seed, absolute-step)-indexed
    # noise stream — bitwise equal to one uninterrupted fused run
    # (CPU tests cover the plumbing with injected eps; only real hardware
    # exercises the in-kernel PRNG path).
    from mppi_robotarm_tpu.config import SimConfig
    from mppi_robotarm_tpu.sim.loop import init_sim, simulate_fused
    simc = SimConfig()
    cfg_f = dataclasses.replace(MPPIConfig(), num_samples=1024, horizon=50)
    s0 = init_sim(cfg_f, simc, jax.random.PRNGKey(11))
    _, rec_full = simulate_fused(arm, cfg_f, simc, ref_path, s0, 20)
    state = init_sim(cfg_f, simc, jax.random.PRNGKey(11))
    parts = []
    for _ in range(2):
        state, rec = simulate_fused(arm, cfg_f, simc, ref_path, state, 10)
        parts.append(rec)
    rec_chunk = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)
    cont = all(np.array_equal(np.asarray(getattr(rec_chunk, f)),
                              np.asarray(getattr(rec_full, f)))
               for f in rec_full._fields)
    print(f"2b. fused chunked==full (PRNG continuation): {cont} "
          f"{'OK' if cont else 'FAIL'}")

    # 3. latency sweep
    for kk, hh in [(1024, 50), (8192, 50), (65536, 50)]:
        c = dataclasses.replace(MPPIConfig(), num_samples=kk, horizon=hh)
        tx = timed_solve_chain(arm, c, ref_path, "xla")
        tp = timed_solve_chain(arm, c, ref_path, "pallas")
        print(f"3. K={kk:6d} H={hh}: xla {tx*1e6:8.1f} us/solve "
              f"({1/tx:8.0f}/s) | pallas {tp*1e6:8.1f} us/solve "
              f"({1/tp:8.0f}/s) | speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    main()
