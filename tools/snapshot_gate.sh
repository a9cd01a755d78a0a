#!/bin/bash
# Snapshot gate: the standing verification the r9 postmortem demanded.
# Run from /root/repo immediately before every end-of-round snapshot
# commit and paste its one-line verdict into CHANGELOG. Refuses (exit 1)
# unless ALL of:
#   1. `sbt compile` + `sbt Test/compile` succeed (an r9-style broken
#      snapshot is refused here);
#   2. graft.tools.GateProbe passes (every oracleSql key names a
#      registered query; queries.size == tools/QUERY_COUNT);
#   3. the fast spec subset is green: EntrySpec (driver contract + all
#      registered queries return rows on sf0.001) and BenchLineSpec
#      (the bench JSON line stays parseable under worst-case inputs —
#      the artifact r5/r8/r9 each fumbled once).
#
# Usage:
#   tools/snapshot_gate.sh            # run the gate
#   tools/snapshot_gate.sh --selftest # prove a broken tree is refused
set -u
cd "$(dirname "$0")/.." || exit 1

stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }
head_sha() { git rev-parse --short HEAD 2>/dev/null || echo nogit; }
refuse() { echo "[gate] REFUSED $(head_sha) $(stamp) — $1"; exit 1; }

if [ "${1:-}" = "--selftest" ]; then
  # Negative test: inject a file that cannot compile, run the gate,
  # require refusal, clean up. The trap guarantees the tree is
  # restored even if the inner run is killed.
  BROKEN=src/main/scala/graft/GateSelftestBroken.scala
  trap 'rm -f "$BROKEN"' EXIT INT TERM
  echo 'package graft; object GateSelftestBroken { val x: Int = "not an int" }' > "$BROKEN"
  if "$0" > /tmp/gate_selftest.log 2>&1; then
    echo "[gate-selftest] FAIL — gate passed a broken tree (see /tmp/gate_selftest.log)"
    exit 1
  fi
  rm -f "$BROKEN"
  trap - EXIT INT TERM
  tail -1 /tmp/gate_selftest.log
  echo "[gate-selftest] OK — broken tree was refused; recompiling clean tree"
  sbt -batch compile > /tmp/gate_selftest_rebuild.log 2>&1 \
    || { echo "[gate-selftest] clean rebuild FAILED"; exit 1; }
  exit 0
fi

sbt -batch 'compile; Test/compile' > /tmp/gate_compile.log 2>&1 \
  || refuse "compile failed (tail: $(tail -3 /tmp/gate_compile.log | tr '\n' ' '))"

tools/run_graft.sh graft.tools.GateProbe > /tmp/gate_probe.log 2>&1 \
  || refuse "registry inconsistency: $(tail -1 /tmp/gate_probe.log)"
PROBE=$(tail -1 /tmp/gate_probe.log)

sbt -batch 'testOnly graft.EntrySpec graft.BenchLineSpec' > /tmp/gate_specs.log 2>&1 \
  || refuse "fast specs failed (tail: $(grep -E '\*\*\* FAILED|Tests:' /tmp/gate_specs.log | tail -2 | tr '\n' ' '))"
SPECS=$(grep -E '^\[info\] Tests: succeeded' /tmp/gate_specs.log | tail -1 | sed 's/^\[info\] //')

# bench/SCALE.json (the machine-readable decade record) must parse and
# cover every recorded family — a family silently dropping out of the
# scale record is a gate failure, not a doc drift.
python3 tools/scale_record.py check > /tmp/gate_scale.log 2>&1 \
  || refuse "SCALE.json check failed: $(tail -1 /tmp/gate_scale.log)"

echo "[gate] GREEN $(head_sha) $(stamp) ${PROBE#\[gateprobe\] OK } | $SPECS"
