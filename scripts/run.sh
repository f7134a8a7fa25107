#!/usr/bin/env bash
# Launch the serving stack (reference: scripts/run.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python examples/serve.py "$@"
