#!/usr/bin/env bash
# Everything waiting on a healthy TPU window, in one serialized run
# (TPU-touching processes must never overlap — CLAUDE.md). Run it in the
# background and read /tmp/chip_checklist.log; each step appends there.
#
#   nohup bash scripts/chip_checklist.sh > /tmp/chip_checklist.log 2>&1 &
#
# Steps (in order of information value per minute):
#   1. bands-decimate bench  -> decide EngineConfig.bands_decimate default
#   2. modal variants bench  -> decide modal_trim_bins / modal_fft_n1 defaults
#   3. bench.py              -> refresh the headline JSON + phase splits
#   4. full TPU test suite   -> the slowest step, last
set -u
cd "$(dirname "$0")/.."

step() {
    echo
    echo "=== [$(date -u +%H:%M:%S)] $1 ==="
}

step "bands-decimate bench (production shape)"
python scripts/bench_bands_decimate.py

step "modal kernel variants bench"
python scripts/bench_modal_variants.py

step "bench.py (headline JSON)"
python bench.py

step "full test suite on the TPU"
python -m pytest tests/ -q

step "done"
