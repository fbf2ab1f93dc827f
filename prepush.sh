#!/usr/bin/env bash
# Pre-push gates (parity with the reference's prepush.sh, which runs
# ruff+mypy+black+pytest; ruff/mypy/black are not installable here, so the
# static gate is compileall + the stdlib-ast linter in tools/lint.py).
set -euo pipefail
cd "$(dirname "$0")"
python -m compileall -q yogo_tpu tests tools bench.py __graft_entry__.py
python tools/lint.py
python -m pytest tests/ -x -q
