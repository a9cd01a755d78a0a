#!/usr/bin/env python3
"""Dev-only: merge a subset check_oracle_json run into CORRECTNESS_100x.json,
stamping each new entry with the replica it ran against.

Usage: python3 tools/merge_100x.py <subset_json> <replica_label> [--force]

Guards (both exit nonzero so a scripted merge can't silently drop work):
 - never overwrites an existing passing entry with a failing one, so a
   re-run against a different replica can't silently degrade the record;
 - without --force, refuses to replace a passing entry with a pass from
   a DIFFERENT replica label — re-stamping the headline record against a
   smaller/partial replica must be a deliberate, flagged act.
"""
import sys, json

def main(subset_json, label, force=False):
    rec = json.load(open("CORRECTNESS_100x.json"))
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
    json.dump(rec, open("CORRECTNESS_100x.json", "w"), indent=1, sort_keys=True)
    n_pass = sum(1 for v in rec.values() if v.get("status", "").startswith("pass"))
    print(f"added {n_add}, updated {n_upd}, refused {n_refused} -> "
          f"{len(rec)} entries, {n_pass} pass")
    return 1 if n_refused else 0

if __name__ == "__main__":
    force = "--force" in sys.argv[3:]
    sys.exit(main(sys.argv[1], sys.argv[2], force))
