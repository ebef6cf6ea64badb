#!/usr/bin/env bash
# Bridge from the C++ capture harness to the Python analysis side:
# run the full per-tap report pipeline over a recorded bundle folder.
#
# usage: analyse_bundle.sh <analysis_runs/run_folder> [--no-plots]
set -euo pipefail

BUNDLE_ROOT="${1:?usage: analyse_bundle.sh <analysis_runs/run_folder> [--no-plots]}"
shift || true

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
ROOT_DIR="$(cd "${SCRIPT_DIR}/.." && pwd)"

cd "${ROOT_DIR}"
exec python -m analyse.cli bundle --input "${BUNDLE_ROOT}" "$@"
