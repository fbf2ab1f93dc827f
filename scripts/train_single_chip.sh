#!/usr/bin/env bash
# Single-chip training run (reference: scripts/submit_cmd.sh).
set -euo pipefail
DATASET_DEFN="$1"; shift || true
python -m yogo_tpu train "$DATASET_DEFN" --half "$@"
