#!/bin/sh
# Serialized real-chip battery (run when the TPU attachment is healthy).
# NEVER run concurrently with the CPU test suite or another chip job:
# the single host core starves the bench loop (see CLAUDE.md).
#
# Usage: sh tools/chip_day.sh [quick]
#   quick = bench + ratchet only (skip profiles)
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== devices =="
timeout 120 python -c "import jax; print(jax.devices())"

echo "== scrap/render-choice end-to-end (round-4 late feature) =="
timeout 900 python tools/verify_scrap_tpu.py

echo "== driver bench (3 runs) =="
for i in 1 2 3; do timeout 900 python bench.py; done

echo "== perf ratchet (speed asserted like parity) =="
LIVES_TPU_TEST_TPU=1 timeout 1800 python -m pytest \
    tests/test_perf_ratchet.py -q

[ "$1" = "quick" ] && exit 0

echo "== 4K banded-sweep experiment (LIVES_TPU_SWEEP_BANDS) =="
for nb in 0 2 4 8; do
    echo "-- bands=$nb --"
    LIVES_TPU_SWEEP_BANDS=$nb timeout 900 python benchmarks/render4k.py \
        || true
done

echo "== 4K sweep decomposition profile (roofline study) =="
for v in full noblur trans trans2 fma; do
    timeout 900 python benchmarks/sweep_profile.py --res 4k --only "$v"
done

echo "== paced live player =="
timeout 1200 python benchmarks/live_player.py

echo "== TPU pallas kernel tests =="
LIVES_TPU_TEST_TPU=1 timeout 1800 python -m pytest tests/test_pallas.py -q

echo "== fused STATEFUL sweep A/B (validates the kernel on the chip) =="
timeout 1200 python benchmarks/render_stateful_led.py || true
