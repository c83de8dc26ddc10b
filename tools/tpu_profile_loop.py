"""Profile the closed-loop simulate(backend='pallas') to attribute the gap
between kernel time (~40us) and closed-loop step time (~92us)."""

import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mppi_robotarm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    import mppi_robotarm_tpu as m

    print("devices:", jax.devices())
    arm, cfg, sim = m.benchmark_preset()
    ref = jnp.asarray(m.synth_circle_path(4000))
    s0 = m.init_sim(cfg, sim, jax.random.PRNGKey(0))
    out = m.simulate(arm, cfg, sim, ref, s0, 100, backend="pallas")
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/looptrace"):
        out = m.simulate(arm, cfg, sim, ref, s0, 100, backend="pallas")
        jax.block_until_ready(out)

    files = sorted(glob.glob("/tmp/looptrace/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0
              and not e.get("name", "").startswith("$")]
    agg = {}
    for e in events:
        name = e["name"]
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"]
    for name, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:30]:
        print(f"{dur/1e3:9.3f} ms  x{cnt:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
