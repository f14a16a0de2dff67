#!/usr/bin/env bash
# Production star-transport demo: mTLS king/client add-ids round +
# the multi-process protocol integration test
# (reference: scripts/prod_net_example.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_star_tls.py tests/test_host_net.py -q
