#!/bin/bash
# Full on-chip validation battery (takes the chip exclusively; ~15 min warm).
# If a stage sits silent >8 min at ~3s CPU, kill its PID and rerun — this
# environment wedges ~1 in 3 process starts (see .claude/skills/verify).
set -u
cd "$(dirname "$0")/.."
echo "=== kernel parity + PRNG + latency sweep ==="
python tools/tpu_validate.py
echo "=== extreme shapes (tile-picker allocation check) ==="
python tools/tpu_extreme_shapes.py
echo "=== fused-vs-per-step long-run discrete parity ==="
python tools/tpu_fused_longrun.py 150
echo "=== batch throughput (config 4) ==="
python tools/tpu_bench_batch.py 1024 1024 30
echo "=== sharded on-chip bitwise (1x1-mesh production programs) ==="
python tools/tpu_sharded_onchip.py
echo "=== stacked-vs-interleaved kernel bitwise (PRNG mode) ==="
python tools/tpu_stacked_bitwise.py
echo "=== round-4 optimization A/Bs (trig carry / fast_select) ==="
python tools/tpu_trig_ab.py
python tools/tpu_fastsel_ab.py
python tools/tpu_fused_fastsel_ab.py
echo "=== round-5 A/Bs (packed-argmin tournament / noise generation) ==="
python tools/tpu_tournament_ab.py
python tools/tpu_noise_ab.py
echo "=== TPU-only pytest assertions (seed space / PRNG statistics) ==="
# these two skip on CPU (hardware PRNG) and run NOWHERE else (round-4
# VERDICT weak #3) — execute them here, on the chip, with skips forbidden.
# MPPI_TEST_TPU=1 stops conftest.py from pinning the CPU backend.
MPPI_TEST_TPU=1 python -m pytest tests/test_pallas.py \
    -k "prng_mode_statistics or seed_space" -v -rs \
    | tee /dev/stderr | grep -q "2 passed" || echo "PYTEST STAGE FAILED"
echo "=== bench-config tracking spread (gate calibration source) ==="
python tools/tpu_bench_gate_sweep.py 4
python tools/tpu_bench_gate_sweep.py 4 high_accuracy
echo "=== config-4 scenario scale (B=32768, auto-chunked records) ==="
python tools/tpu_bench_batch.py 32768 128 30
echo "=== headline bench ==="
python bench.py
