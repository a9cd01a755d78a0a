#!/usr/bin/env python3
"""Dev-only: merge a subset check_oracle_json run into CORRECTNESS_100x.json,
stamping each new entry with the replica it ran against.

Usage: python3 tools/merge_100x.py <subset_json> <replica_label>

Refuses to overwrite an existing passing entry with a failing one so a
re-run against a different replica can't silently degrade the record.
"""
import sys, json

def main(subset_json, label):
    rec = json.load(open("CORRECTNESS_100x.json"))
    new = json.load(open(subset_json))
    n_add = n_upd = 0
    for name, v in new.items():
        v = dict(v)
        v["replica"] = label
        old = rec.get(name)
        if old and old.get("status", "").startswith("pass") and \
                not v.get("status", "").startswith("pass"):
            print(f"REFUSE {name}: would replace {old['status']} with {v['status']}")
            continue
        if old is None:
            n_add += 1
        else:
            n_upd += 1
        rec[name] = v
    json.dump(rec, open("CORRECTNESS_100x.json", "w"), indent=1, sort_keys=True)
    n_pass = sum(1 for v in rec.values() if v.get("status", "").startswith("pass"))
    print(f"added {n_add}, updated {n_upd} -> {len(rec)} entries, {n_pass} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
