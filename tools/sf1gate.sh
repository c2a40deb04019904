#!/usr/bin/env bash
# sf1 (10x) oracle spot-gate — see tools/sfgate.sh for the shared body.
# Its first run caught q240's composite-key stride wrap; kept as the
# third-scale column of every round close-out.
set -euo pipefail
cd "$(dirname "$0")/.."
exec bash tools/sfgate.sh "${1:-target/testdata-sf1}" "${2:-/tmp/verify_sf1gate}" SF1GATE.json sf1gate
