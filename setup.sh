#!/usr/bin/env bash
# Environment check + native build for audio_analysis_tpu.
#
# The Python side has no extra dependencies beyond jax / numpy / scipy /
# matplotlib (all provided by the environment). This script verifies the
# interpreter can import the package and builds the native I/O runtime.
set -euo pipefail

cd "$(dirname "${BASH_SOURCE[0]}")"

python - <<'PY'
import jax, numpy, scipy, matplotlib
import audio_analysis_tpu
print("audio_analysis_tpu", audio_analysis_tpu.__version__)
print("jax", jax.__version__, "backend:", jax.default_backend())
PY

make -C cpp
echo "native runtime built: cpp/build/libaudioio.so"
