#!/usr/bin/env bash
# Run the full test suite + native build (reference: scripts/test.sh runs
# ctest + python tests).
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
python -m pytest tests/ -q "$@"
