#!/usr/bin/env bash
# Pre-snapshot gate (VERDICT r10 #6 / next-round #4): run before EVERY
# end-of-round (or milestone) commit. A snapshot that does not compile
# wipes the whole round's correctness + bench signal — 30 seconds here
# is always worth it.
#
# Usage:
#   scripts/snapshot_gate.sh                 # compile + full test
#   scripts/snapshot_gate.sh --compile-only  # the 30-second minimum
#   scripts/snapshot_gate.sh q_bm25,q_tfidf  # compile + Verify subset
#                                            # for the touched queries
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[gate] sbt compile + Test/compile ..."
sbt compile "Test/compile" > /tmp/snapshot_gate_compile.log 2>&1 || {
  echo "[gate] FAIL: compile broken — do NOT commit. Tail:"
  tail -30 /tmp/snapshot_gate_compile.log
  exit 1
}
echo "[gate] compile OK"

arg="${1:-}"
if [ "$arg" = "--compile-only" ]; then
  echo "[gate] PASS (compile-only)"
  exit 0
fi

if [ -n "$arg" ]; then
  out=$(mktemp -d /tmp/snapshot_gate_verify.XXXX)
  echo "[gate] Verify subset: $arg ..."
  sbt "runMain graft.Verify /root/testdata/sf0.001 $out $arg" \
    > /tmp/snapshot_gate_verify.log 2>&1 || {
    echo "[gate] FAIL: Verify subset errored. Tail:"
    tail -30 /tmp/snapshot_gate_verify.log
    exit 1
  }
  python3 scripts/check_oracle.py /root/testdata/sf0.001 "$out" || {
    echo "[gate] FAIL: oracle mismatch on subset"
    exit 1
  }
  echo "[gate] PASS (compile + verified: $arg)"
  exit 0
fi

echo "[gate] sbt test ..."
sbt test > /tmp/snapshot_gate_test.log 2>&1 || {
  echo "[gate] FAIL: tests red — do NOT commit. Tail:"
  tail -40 /tmp/snapshot_gate_test.log
  exit 1
}
echo "[gate] PASS (compile + full test)"
