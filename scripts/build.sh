#!/usr/bin/env bash
# Build native components (reference: scripts/build.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
echo "native components built: $(ls native/build)"
