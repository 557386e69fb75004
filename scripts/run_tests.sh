#!/bin/bash
# Per-file test runner with one retry (CLAUDE.md rule 6b: a single long
# pytest process intermittently segfaults inside XLA CPU backend_compile;
# per-file processes with a retry are the sanctioned equivalent — same
# coverage, ~17 min). Usage: bash scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fails=()
for f in tests/test_*.py; do
  echo "[run_tests] $f"
  if ! timeout 1200 python -m pytest "$f" -q "$@"; then
    echo "[run_tests] retrying $f"
    timeout 1200 python -m pytest "$f" -q "$@" || fails+=("$f")
  fi
done
if [ ${#fails[@]} -gt 0 ]; then
  echo "[run_tests] FAILED: ${fails[*]}"
  exit 1
fi
echo "[run_tests] all files green"
