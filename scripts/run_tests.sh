#!/usr/bin/env bash
# CI entry: full suite on the 8-device virtual CPU mesh
# (reference: .github/workflows/ci.yml test matrix)
set -euo pipefail
cd "$(dirname "$0")/.."
ulimit -s 524288 2>/dev/null || true
python -m pytest tests/ -q "$@"
