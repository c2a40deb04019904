#!/usr/bin/env bash
# sf10 (100x) oracle spot-gate (r16, VERDICT #2) — see tools/sfgate.sh.
# The decade boundary above sf1: 1e9-scale keys, band hashes and DECIMAL
# widths only exercise here; same ~20-query subset, SF10GATE.json record.
set -euo pipefail
cd "$(dirname "$0")/.."
exec bash tools/sfgate.sh "${1:-target/testdata-x100}" "${2:-/tmp/verify_sf10gate}" SF10GATE.json sf10gate
