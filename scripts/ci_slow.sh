#!/bin/bash
# Heavy-compile CI tier (VERDICT round-1 item 9): runs every test the default
# suite deselects (-m slow) — full task-family step paths, the multi-process
# PBT population exchange, mesh-SDF task wiring.  Run per round; record the
# wall time in PROGRESS.md.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
exec python -m pytest tests/ -m slow -q --durations=15 "$@"
