#!/bin/bash
# Grouped test runner (VERDICT r4 item 7). CLAUDE.md rule 6b: one long
# pytest process over the whole suite intermittently segfaults inside XLA
# CPU backend_compile, so the suite cannot run as a single process — but
# per-file processes paid ~5-9 min of repeated jax startup (~17 min total).
# Middle ground: THREE sequential pytest processes (never concurrent — the
# segfault worsens under concurrent CPU JAX), each with one retry. The two
# slowest files (test_e2e ~8 min, test_cli ~6 min) anchor separate groups;
# the rest is split round-robin. A group that fails twice reports its exit
# code (139 = the known segfault; anything else is a real failure).
# Usage: bash scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

mapfile -t all < <(ls tests/test_*.py)
g1=(tests/test_e2e.py)
g2=(tests/test_cli.py)
g3=()
i=0
for f in "${all[@]}"; do
  [[ "$f" == tests/test_e2e.py || "$f" == tests/test_cli.py ]] && continue
  case $((i % 3)) in
    0) g1+=("$f") ;;
    1) g2+=("$f") ;;
    2) g3+=("$f") ;;
  esac
  i=$((i + 1))
done

t_start=$SECONDS
fails=()
run_group() {
  local name=$1; shift
  echo "[run_tests] group $name: $# files"
  if ! timeout 2400 python -m pytest "$@" -q "${extra[@]}"; then
    local rc=$?
    echo "[run_tests] group $name failed (rc=$rc) — retrying once"
    if ! timeout 2400 python -m pytest "$@" -q "${extra[@]}"; then
      rc=$?
      echo "[run_tests] group $name FAILED twice (rc=$rc)"
      fails+=("$name(rc=$rc)")
    fi
  fi
}

extra=("$@")
run_group A "${g1[@]}"
run_group B "${g2[@]}"
run_group C "${g3[@]}"

echo "[run_tests] wall: $((SECONDS - t_start))s"
if [ ${#fails[@]} -gt 0 ]; then
  echo "[run_tests] FAILED groups: ${fails[*]}"
  exit 1
fi
echo "[run_tests] all groups green"
