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
#
# Side effect worth knowing: every step compiles through the persistent
# XLA cache (~/.cache/aa_tpu_xla, enabled at audio_analysis_tpu.ops
# import), so one checklist pass PRE-SEEDS the cache for all standard
# shapes — the next bench.py / bundle run in this container starts with
# compile ~= cache-load (~3 s/program) instead of 20-40 s/program. The
# bench records this state as xla_cache_entries_before/new_entries.
set -u
cd "$(dirname "$0")/.."

# fresh checkouts have no native decode library — every step below would
# silently measure the scipy fallback otherwise
make -C cpp

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
