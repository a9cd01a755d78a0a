#!/usr/bin/env python3
"""Machine-readable scale-decade record: bench/SCALE.json.

The 100x/1000x evidence lived only as markdown tables in
bench/SCALE_100x.md; this tool owns the diffable JSON twin so the
driver can compare decades round-over-round the way it diffs
BENCH_local.json. One record per (family, decade) headline
measurement:

  {"family": "dedup", "decade": "1000x", "replica": "target/sf1000docs",
   "rows": 5714285, "query": "dedup_corpus_composed", "seconds": 1312.6,
   "verdict": "pass", "round": 11, "note": "..."}

Usage:
  tools/scale_record.py add --family dedup --decade 1000x \
      --replica target/sf1000docs --rows 5714285 \
      --query dedup_corpus_composed --seconds 1312.6 \
      --verdict pass --round 11 --note "..."
  tools/scale_record.py check          # schema + family-coverage gate

`add` validates the record, refuses exact-duplicate keys
(family, decade, query) unless --force re-stamps, and rewrites the
file sorted so diffs are stable. `check` exits nonzero unless the file
parses, every record is schema-valid, and every REQUIRED_FAMILY has at
least one recorded decade — wired into tools/snapshot_gate.sh so a
family can't silently drop out of the record.
"""
import argparse
import json
import os
import sys

PATH = os.path.join(os.path.dirname(__file__), "..", "bench", "SCALE.json")

VERDICTS = {"pass", "fixed", "characterized"}
DECADES = {"1x", "10x", "100x", "1000x"}
REQUIRED_FAMILIES = {
    "dedup", "spans", "embedding", "text", "corpus_ops",
    "events", "ipes", "streaming", "sources",
}
REQUIRED_KEYS = {
    "family": str, "decade": str, "replica": str, "rows": int,
    "query": str, "seconds": (int, float), "verdict": str,
    "round": int, "note": str,
}


def load():
    if not os.path.exists(PATH):
        return []
    with open(PATH) as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise SystemExit(f"{PATH}: top level must be a list")
    return data


def validate(rec, i="?"):
    for k, t in REQUIRED_KEYS.items():
        if k not in rec:
            raise SystemExit(f"record {i}: missing key '{k}': {rec}")
        if not isinstance(rec[k], t):
            raise SystemExit(f"record {i}: '{k}' must be {t}: {rec[k]!r}")
    if rec["verdict"] not in VERDICTS:
        raise SystemExit(f"record {i}: verdict {rec['verdict']!r} not in {sorted(VERDICTS)}")
    if rec["decade"] not in DECADES:
        raise SystemExit(f"record {i}: decade {rec['decade']!r} not in {sorted(DECADES)}")
    if rec["rows"] <= 0 or rec["seconds"] < 0:
        raise SystemExit(f"record {i}: rows must be > 0 and seconds >= 0: {rec}")
    extra = set(rec) - set(REQUIRED_KEYS)
    if extra:
        raise SystemExit(f"record {i}: unknown keys {sorted(extra)}")


def save(data):
    data.sort(key=lambda r: (r["family"], DECADES_ORDER[r["decade"]], r["query"]))
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")


DECADES_ORDER = {"1x": 0, "10x": 1, "100x": 2, "1000x": 3}


def cmd_add(args):
    data = load()
    rec = {
        "family": args.family, "decade": args.decade, "replica": args.replica,
        "rows": args.rows, "query": args.query, "seconds": args.seconds,
        "verdict": args.verdict, "round": args.round, "note": args.note,
    }
    validate(rec)
    key = (rec["family"], rec["decade"], rec["query"])
    dup = [r for r in data if (r["family"], r["decade"], r["query"]) == key]
    if dup and not args.force:
        raise SystemExit(
            f"duplicate record for {key}: {dup[0]} (use --force to re-stamp)")
    data = [r for r in data if (r["family"], r["decade"], r["query"]) != key]
    data.append(rec)
    save(data)
    print(f"[scale] recorded {key} -> {rec['seconds']} s ({len(data)} records)")


def cmd_check(_args):
    data = load()
    for i, rec in enumerate(data):
        validate(rec, i)
    families = {r["family"] for r in data}
    missing = REQUIRED_FAMILIES - families
    if missing:
        raise SystemExit(f"SCALE.json missing required families: {sorted(missing)}")
    deepest = {}
    for r in data:
        d = DECADES_ORDER[r["decade"]]
        if d > deepest.get(r["family"], (-1, ""))[0]:
            deepest[r["family"]] = (d, r["decade"])
    print(f"[scale] OK: {len(data)} records, {len(families)} families; deepest: "
          + ", ".join(f"{f}={d}" for f, (_, d) in sorted(deepest.items())))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("add")
    a.add_argument("--family", required=True)
    a.add_argument("--decade", required=True)
    a.add_argument("--replica", required=True)
    a.add_argument("--rows", type=int, required=True)
    a.add_argument("--query", required=True)
    a.add_argument("--seconds", type=float, required=True)
    a.add_argument("--verdict", required=True)
    a.add_argument("--round", type=int, required=True)
    a.add_argument("--note", default="")
    a.add_argument("--force", action="store_true")
    a.set_defaults(fn=cmd_add)
    c = sub.add_parser("check")
    c.set_defaults(fn=cmd_check)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
