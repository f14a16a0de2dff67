#!/usr/bin/env bash
# dMSM sweep on the attached TPU chip
# (reference: scripts/dmsm_bench.zsh -> dist-primitives dmsm_bench example)
set -euo pipefail
cd "$(dirname "$0")/.."
python examples/dmsm_bench.py "${1:-10}" "${2:-13}"
