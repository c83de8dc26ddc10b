"""On-chip A/B evidence for the group-level ``pl.when(any_active)`` solve
skip in ops/pallas_sim.py (round-3 VERDICT item 3).

The round-3 end-of-round snapshot (8f119f3) rewrote both fused sim kernels
to skip the entire solve phase once every scenario in the group is frozen
(path end, Q6), moving the solve stats across the region boundary through
SMEM/VMEM.  This tool produces the two missing pieces of evidence:

  1. **Bitwise A/B**: dumps every record lane + final control of
     (a) the interleaved kernel on a LIVE path (bench config, no freeze),
     (b) the interleaved kernel on a run that crosses the path end
         (2000-pt path, 4000 steps → ~1900 frozen steps),
     (c) the stacked kernel (K=128, B=8 fleet) on the same crossing run —
     run it once per tree (current vs pre-refactor worktree of d23f222)
     and diff the npz files.
  2. **Past-path-end step cost**: the refactor's stated motivation.  Timed
     pairs (2000 live steps) vs (4000 steps, second half frozen) give the
     frozen-step cost by subtraction; reported per tree.

Usage:
    python tools/tpu_ab_refactor.py <repo_root> <out.npz>
then:
    python tools/tpu_ab_refactor.py /root/repo         /tmp/ab_post.npz
    python tools/tpu_ab_refactor.py /root/repo/.ab_pre /tmp/ab_pre.npz
    python - <<'EOF'  # byte compare
    import numpy as np
    a, b = (np.load(f) for f in ("/tmp/ab_pre.npz", "/tmp/ab_post.npz"))
    for k in a.files:
        same = np.array_equal(a[k], b[k])
        print(k, "BITWISE-EQUAL" if same else "** DIFFERS **")
    EOF
"""

import sys
import time

repo = sys.argv[1]
out_path = sys.argv[2]
sys.path.insert(0, repo)

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import mppi_robotarm_tpu as m  # noqa: E402

print(f"tree={repo}  devices={jax.devices()}")
arm, cfg, sim = m.benchmark_preset()           # K=1024, H=50
dump = {}


def record(tag, rec, ufin):
    for f in ("q", "dq", "u", "ee", "wp_idx", "cost_min", "cost_mean",
              "ess", "weight_entropy", "done"):
        dump[f"{tag}.{f}"] = np.asarray(getattr(rec, f))
    dump[f"{tag}.u_fin"] = np.asarray(ufin)


def timed(fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


# (a) live path, interleaved kernel, bench config -------------------------
ref_live = jnp.asarray(m.synth_circle_path(8000))
s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
final, rec = m.simulate_fused(arm, cfg, sim, ref_live, s0, 600)
jax.block_until_ready(rec.q)
record("live", rec, final.mppi.u_prev)
print(f"live 600-step run: done={int(np.asarray(rec.done).sum())} frozen")

# (b) path-end crossing, interleaved kernel.  A PARTIAL-revolution path:
# full-circle synth paths can never reach path-end (their θ≈2π closure
# overrides duplicate the final rows, and Q5 first-win tie-breaking pins the
# frozen index below n-1 forever — parity, not a bug); 0.85 revolutions has
# a strictly-monotone tail the plant actually crosses (~step 1500).
ref_short = jnp.asarray(m.synth_circle_path(1500, revolutions=0.85))
s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
final, rec = m.simulate_fused(arm, cfg, sim, ref_short, s0, 4000)
jax.block_until_ready(rec.q)
record("cross", rec, final.mppi.u_prev)
n_frozen = int(np.asarray(rec.done).sum())
print(f"crossing 4000-step run: {n_frozen} frozen steps")

# (c) path-end crossing, stacked kernel (K=128, B=8) ----------------------
cfg_s = dataclasses.replace(cfg, num_samples=128, horizon=30)
keys = jax.random.split(jax.random.PRNGKey(0), 8)
ss0 = m.init_sim_batch(cfg_s, sim, keys)
final, rec = m.simulate_fused_batch(arm, cfg_s, sim, ref_short, ss0, 4000)
jax.block_until_ready(rec.q)
record("stacked", rec, final.mppi.u_prev)
print(f"stacked crossing run: {int(np.asarray(rec.done).sum())} frozen rows")

# timing: frozen-step cost by 2-point subtraction -------------------------
s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
t_live = timed(lambda: m.simulate_fused(arm, cfg, sim, ref_short, s0, 2000))
t_cross = timed(lambda: m.simulate_fused(arm, cfg, sim, ref_short, s0, 4000))
frozen_in_cross = n_frozen
live_in_cross = 4000 - frozen_in_cross
live_rate = t_live / 2000
frozen_cost = (t_cross - live_rate * live_in_cross) / max(frozen_in_cross, 1)
print(f"live step: {live_rate * 1e6:.2f} us | frozen step: "
      f"{frozen_cost * 1e6:.2f} us  ({frozen_in_cross} frozen of 4000; "
      f"t2000={t_live * 1e3:.1f} ms, t4000={t_cross * 1e3:.1f} ms)")
dump["timing"] = np.array([live_rate, frozen_cost, t_live, t_cross])

np.savez(out_path, **dump)
print(f"wrote {out_path}: {len(dump)} arrays")
