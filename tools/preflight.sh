#!/bin/bash
# Snapshot preflight (VERDICT r11 #2 / r12 #5): run before any
# round-closing commit so the committed HEAD provably compiles and the
# doc/oracle surface is self-consistent. The r11 incident this guards
# against: a snapshot landed mid-edit, HEAD did not compile, and every
# downstream gate (Verify, Bench, correctness JSON) silently zeroed.
#
# Usage: tools/preflight.sh [verifyOutDir]
#   verifyOutDir (optional): a graft.Verify output dir to run the
#   coverage + oracle-lint checks against (default: skip those two).
#
# Exit code 0 = safe to commit. Any failure prints the failing stage.
set -u
cd "$(dirname "$0")/.."
fail() { echo "PREFLIGHT FAIL: $1" >&2; exit 1; }

echo "== preflight: compile (main + test) =="
sbt -batch "compile; Test/compile" >/tmp/preflight_compile.log 2>&1 \
  || { tail -30 /tmp/preflight_compile.log >&2; fail "compile"; }

echo "== preflight: oracle lint =="
python3 tools/lint_oracles.py || fail "lint_oracles"

if [ $# -ge 1 ]; then
  echo "== preflight: coverage check against $1 =="
  python3 tools/check_coverage.py "$1" || fail "check_coverage"
fi

echo "== preflight: no uncommitted bench/correctness artifacts left behind =="
# round artifacts must be IN the snapshot, not dirty in the tree
dirty=$(git status --porcelain BENCH_local.json LEAKCHECK.json 2>/dev/null)
if [ -n "$dirty" ]; then
  echo "WARNING: round artifacts modified but not staged:" >&2
  echo "$dirty" >&2
  echo "(stage them with the closing commit — not fatal)" >&2
fi

echo "PREFLIGHT OK"
