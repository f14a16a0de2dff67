#!/usr/bin/env bash
# Full distributed SHA-256 Groth16 prove on the attached TPU chip
# (reference: scripts/sha256.zsh -> groth16 sha256 example)
set -euo pipefail
cd "$(dirname "$0")/.."
python examples/sha256_e2e.py "${1:-1}" "${2:-2}"
