#!/bin/bash
# Full on-chip validation battery (takes the chip exclusively; ~30 min warm).
# Every stage runs under `timeout` with ONE automatic retry: this
# environment wedges ~1 in 3 python process starts before device init
# (see .claude/skills/verify), and an unguarded wedge used to stall the
# whole battery.  A stage that fails twice is reported and the battery
# continues — the summary line at the end lists failed stages.
set -u
cd "$(dirname "$0")/.."

FAILED=""

stage() {
    local name="$1"; shift
    local tmo="$1"; shift
    local rc
    echo "=== $name ==="
    timeout "$tmo" "$@"; rc=$?
    if [ "$rc" -eq 0 ]; then
        return 0
    fi
    echo "--- stage '$name' failed/timed out (rc=$rc), retrying once ---"
    timeout "$tmo" "$@"; rc=$?
    if [ "$rc" -eq 0 ]; then
        return 0
    fi
    echo "--- stage '$name' FAILED twice (rc=$rc) ---"
    FAILED="$FAILED '$name'"
}

stage "kernel parity + PRNG + latency sweep" 600 \
    python tools/tpu_validate.py
stage "extreme shapes (tile-picker allocation check)" 600 \
    python tools/tpu_extreme_shapes.py
stage "fused-vs-per-step long-run discrete parity" 600 \
    python tools/tpu_fused_longrun.py 150
stage "batch throughput (config 4)" 600 \
    python tools/tpu_bench_batch.py 1024 1024 30
stage "sharded on-chip bitwise (1x1-mesh production programs)" 600 \
    python tools/tpu_sharded_onchip.py
stage "stacked-vs-interleaved kernel bitwise (PRNG mode)" 600 \
    python tools/tpu_stacked_bitwise.py
stage "round-4 A/B: trig carry" 600 python tools/tpu_trig_ab.py
stage "round-4 A/B: fast_select (per-step)" 600 python tools/tpu_fastsel_ab.py
stage "round-4 A/B: fast_select (fused loop)" 600 \
    python tools/tpu_fused_fastsel_ab.py
stage "round-5 A/B: packed-argmin tournament" 600 \
    python tools/tpu_tournament_ab.py
stage "round-5 A/B: noise generation (solve)" 600 \
    python tools/tpu_noise_ab.py solve
stage "round-5 A/B: noise generation (fused)" 600 \
    python tools/tpu_noise_ab.py fused
stage "round-5 A/B: micro-levers (recip/icdf, fused)" 600 \
    python tools/tpu_microlever_ab.py fused
stage "round-5 A/B: micro-levers (recip/icdf, solve)" 600 \
    python tools/tpu_microlever_ab.py solve

# the two TPU-only pytest tests skip on CPU (hardware PRNG) and run NOWHERE
# else (round-4 VERDICT weak #3) — execute them here, on the chip, with
# skips forbidden.  MPPI_TEST_TPU=1 stops conftest.py pinning CPU.
echo "=== TPU-only pytest assertions (seed space / PRNG statistics) ==="
tpu_pytest() {
    # success = pytest rc 0 AND nothing skipped/failed AND >=1 passed
    # (a bare "grep '2 passed'" both breaks when a third test joins the
    # -k selection and matches "1 failed, 2 passed" — reviewer finding)
    local log=/tmp/battery_tpu_pytest.log
    MPPI_TEST_TPU=1 timeout 600 python -m pytest tests/test_pallas.py \
        -k "prng_mode_statistics or seed_space" -v -rs > "$log" 2>&1
    local rc=$?
    cat "$log"
    [ "$rc" -eq 0 ] && grep -qE "[0-9]+ passed" "$log" \
        && ! grep -qE "[0-9]+ (failed|error|skipped)" "$log"
}
if ! tpu_pytest; then
    echo "--- retrying TPU pytest stage ---"
    tpu_pytest || FAILED="$FAILED 'tpu-pytest'"
fi

stage "bench-config tracking spread (gate calibration source)" 600 \
    python tools/tpu_bench_gate_sweep.py 4
stage "high-accuracy tracking spread (gate calibration source)" 600 \
    python tools/tpu_bench_gate_sweep.py 4 high_accuracy
stage "config-4 scenario scale (B=32768, auto-chunked records)" 600 \
    python tools/tpu_bench_batch.py 32768 128 30
stage "headline bench" 600 python bench.py

if [ -n "$FAILED" ]; then
    echo "BATTERY INCOMPLETE — failed stages:$FAILED"
    exit 1
fi
echo "BATTERY COMPLETE — all stages passed"
