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
# round artifacts must be IN the snapshot, not dirty in the tree.
# r13 ADVICE: glob the whole artifact family, and make the check FATAL
# when a verifyOutDir was supplied (i.e. this is a round-closing run) —
# the incident class (artifacts missing from the snapshot commit)
# recurred in r12 AND r13 as a warning.
dirty=$(git status --porcelain 'BENCH_*.json' 'CORRECTNESS_*.json' \
  VERDICT.md ADVICE.md LEAKCHECK.json COPYCHECK.json 2>/dev/null)
if [ -n "$dirty" ]; then
  echo "round artifacts modified but not staged:" >&2
  echo "$dirty" >&2
  if [ $# -ge 1 ]; then
    fail "stage round artifacts with the closing commit (fatal on round-closing runs)"
  else
    echo "(stage them with the closing commit — not fatal without verifyOutDir)" >&2
  fi
fi

echo "== preflight: bench variance guard =="
# flags >1.3x drift on UNTOUCHED queries between the two most recent
# committed sf1 benches (VERDICT r13 #4): a real regression must be
# distinguishable from the documented ambient box variance. Warning-only
# (variance is ambient); the point is the drift is SEEN at commit time.
python3 tools/bench_drift.py || echo "(bench drift check unavailable — not fatal)" >&2

echo "PREFLIGHT OK"
