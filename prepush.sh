#!/usr/bin/env bash
# Pre-push gates (parity with the reference's prepush.sh: tests + static checks).
set -euo pipefail
cd "$(dirname "$0")"
python -m compileall -q yogo_tpu tests
python -m pytest tests/ -x -q
