#!/usr/bin/env bash
# CI entry: full suite on the 8-device virtual CPU mesh
# (reference: .github/workflows/ci.yml test matrix)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
