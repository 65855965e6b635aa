#!/usr/bin/env bash
# Full local gate: unit/streaming tests, DuckDB-oracle verify at all three
# scale factors, and the sf0.1 bench. Mirrors what the driver runs.
# Usage: tools/gate.sh [--quick]   (--quick = tests + sf0.01 verify only)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests:|FAILED" | tail -2

tiers="0.001 0.01 0.1"
[ "${1:-}" = "--quick" ] && tiers="0.01"
for sf in $tiers; do
  out="/tmp/gate_vout_$sf"
  echo "== verify sf$sf =="
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" > /tmp/gate_verify_$sf.log 2>&1
  if grep -q "\[verify\].*failed" /tmp/gate_verify_$sf.log; then
    echo "VERIFY FAILURES:"; grep "\[verify\].*failed" /tmp/gate_verify_$sf.log
    exit 1
  fi
  grep -c "Failed to compile" /tmp/gate_verify_$sf.log > /dev/null && \
    { c=$(grep -c "Failed to compile" /tmp/gate_verify_$sf.log); \
      [ "$c" != "0" ] && echo "WARNING: $c janino codegen fallbacks (perf bug)"; }
  python3 tools/check_oracle.py "/root/testdata/sf$sf" "$out" | tail -1
done

if [ "${1:-}" != "--quick" ]; then
  echo "== bench sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/\[info\] //'
fi
echo "== gate complete =="
