#!/usr/bin/env python3
"""Dev-only: merge a subset check_oracle_json run into a named
correctness record (CORRECTNESS_100x.json, CORRECTNESS_1000x.json, a
seed record, ...), stamping each new entry with the replica it ran
against. The generalized form of merge_100x.py — same guards:

 - never overwrites an existing passing entry with a failing one;
 - without --force, refuses to replace a passing entry with a pass
   from a DIFFERENT replica label (re-stamping must be deliberate).

Usage: python3 tools/merge_record.py <record_json> <subset_json> <replica_label> [--force]
Creates <record_json> if absent (the 1000x record's bootstrap path).
"""
import sys, json, os

def main(record_json, subset_json, label, force=False):
    rec = json.load(open(record_json)) if os.path.exists(record_json) else {}
    new = json.load(open(subset_json))
    n_add = n_upd = n_refused = 0
    for name, v in new.items():
        v = dict(v)
        v["replica"] = label
        old = rec.get(name)
        old_pass = bool(old) and old.get("status", "").startswith("pass")
        new_pass = v.get("status", "").startswith("pass")
        if old_pass and not new_pass:
            print(f"REFUSE {name}: would replace {old['status']} with {v['status']}")
            n_refused += 1
            continue
        if old_pass and new_pass and old.get("replica") != label and not force:
            print(f"REFUSE {name}: pass from replica '{old.get('replica')}' would be "
                  f"re-stamped by replica '{label}' — pass --force if deliberate")
            n_refused += 1
            continue
        if old is None:
            n_add += 1
        else:
            n_upd += 1
        rec[name] = v
    json.dump(rec, open(record_json, "w"), indent=1, sort_keys=True)
    n_pass = sum(1 for v in rec.values() if v.get("status", "").startswith("pass"))
    print(f"added {n_add}, updated {n_upd}, refused {n_refused} -> "
          f"{len(rec)} entries, {n_pass} pass ({record_json})")
    return 1 if n_refused else 0

if __name__ == "__main__":
    force = "--force" in sys.argv[4:]
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], force))
