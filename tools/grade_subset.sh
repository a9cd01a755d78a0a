#!/bin/bash
# Dev-only: run a named-query subset end-to-end against one fixture /
# replica dir and merge the graded entries into a correctness record.
#
#   tools/grade_subset.sh <sfDir> <outDir> <record_json> "<replica label>" \
#       <q1,q2,...> [excluded] [full1=sampled1,...] [digest1,...] [--force]
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

bash tools/run_graft.sh graft.Verify "$SFDIR" "$OUT" "$QUERIES" 2>&1 \
  | grep -E '\[verify\]' || true

python3 - "$OUT" "$QUERIES" "$EXCLUDED" <<'PY'
import json, sys
out, queries = sys.argv[1], set(sys.argv[2].split(","))
# keep the documented-exclusion names too: they are never dumped or
# replayed, but the grader records them as excluded_oracle_intractable
# so the record carries the reason instead of a silent hole.
queries |= set(q for q in sys.argv[3].split(",") if q)
o = json.load(open(f"{out}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in queries},
          open(f"{out}/oracle_sql.json", "w"))
PY

python3 tools/check_oracle_json.py "$SFDIR" "$OUT" "$OUT/graded.json" \
  "$EXCLUDED" "$SMAP" "$DIGEST"
python3 tools/merge_record.py "$RECORD" "$OUT/graded.json" "$LABEL" $FORCE
