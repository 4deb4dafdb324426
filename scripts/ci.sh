#!/usr/bin/env bash
# CI entry: lint (if ruff is installed) + the fast test tier (<4 min on a
# 1-CPU box), then the virtual 8-device multi-chip dryrun.
# The slow tier (Pallas interpret mode, multi-process, end-to-end apps)
# runs with:  python -m pytest tests/ -q -m slow
set -euo pipefail
cd "$(dirname "$0")/.."

if python -m ruff --version >/dev/null 2>&1; then
  python -m ruff check mixgrpo_tpu tests scripts bench.py __graft_entry__.py
else
  echo "ruff not installed; skipping lint"
fi

python -m pytest tests/ -q -m "not slow"

XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import __graft_entry__ as ge
ge.dryrun_multichip(8)
EOF
