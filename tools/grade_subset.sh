#!/bin/bash
# Dev-only: run a named-query subset end-to-end against one fixture /
# replica dir and merge the graded entries into a correctness record.
#
#   tools/grade_subset.sh <sfDir> <outDir> <record_json> "<replica label>" \
#       <q1,q2,...> [excluded] [full1=sampled1,...] [digest1,...] [--force]
#
# [excluded] entries are `name` or `name=reason` — the reason is
# recorded verbatim on the excluded_oracle_intractable entry so the
# record is self-describing (reasons may contain spaces, not commas).
#
# Steps: graft.Verify subset dump -> filter oracle_sql.json to the
# dumped keys (Verify always writes the FULL oracle map; grading the
# absent ones would record every one as an error) -> check_oracle_json
# (sampled-twin + digest modes as passed through) -> merge_record.
# Env knobs: SPARK_GRAFT_CPUS / SPARK_DRIVER_MEM for the Spark side,
# DUCK_MEM / DUCK_ISOLATE / DUCK_QUERY_TIMEOUT for the oracle side.
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="$1"; OUT="$2"; RECORD="$3"; LABEL="$4"; QUERIES="$5"
EXCLUDED="${6:-}"; SMAP="${7:-}"; DIGEST="${8:-}"; FORCE="${9:-}"

# Wipe the out dir first: a reused /tmp dir holding a previous run's
# dumps would otherwise grade STALE parquet if this Verify run crashed.
rm -rf "$OUT"
# Run Verify as its own statement so ITS exit code gates the grade
# (under pipefail, `verify | grep || true` swallowed a Verify crash
# together with grep's no-match exit).
VLOG=$(bash tools/run_graft.sh graft.Verify "$SFDIR" "$OUT" "$QUERIES" 2>&1) \
  || { printf '%s\n' "$VLOG" | tail -20; echo "[grade_subset] Verify FAILED"; exit 1; }
printf '%s\n' "$VLOG" | grep -E '\[verify\]' || true

python3 - "$OUT" "$QUERIES" "$EXCLUDED" <<'PY'
import json, sys
out, queries = sys.argv[1], set(sys.argv[2].split(","))
# keep the documented-exclusion names too (reason part stripped):
# they are never dumped or replayed, but the grader records them as
# excluded_oracle_intractable so the record carries the reason
# instead of a silent hole.
queries |= set(q.partition("=")[0] for q in sys.argv[3].split(",") if q)
o = json.load(open(f"{out}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in queries},
          open(f"{out}/oracle_sql.json", "w"))
PY

python3 tools/check_oracle_json.py "$SFDIR" "$OUT" "$OUT/graded.json" \
  "$EXCLUDED" "$SMAP" "$DIGEST"
python3 tools/merge_record.py "$RECORD" "$OUT/graded.json" "$LABEL" $FORCE
