#!/usr/bin/env python3
"""Dev-only parity checker mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table by basename, runs every oracle_sql.json
query, and compares against the Spark-written parquet in verifyOutDir:
column names (sorted), row count, and sorted-row hash. NOT part of the
shipped library — pure local tooling.
"""
import sys, json, glob, os
import duckdb

def canon(rows):
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return sorted(tuple(norm(v) for v in r) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        # spark-written tables are DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
            # reorder both by sorted column name
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            srows = canon([[r[i] for i in sidx] for r in sdf])
            orows = canon([[r[i] for i in oidx] for r in odf])
            if sorted(scols) != sorted(ocols):
                print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
                n_fail += 1
            elif srows != orows:
                diff = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b][:3]
                print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)} first_diffs={diff}")
                for i in diff:
                    print(f"   spark : {srows[i]}")
                    print(f"   oracle: {orows[i]}")
                if len(srows) != len(orows):
                    print(f"   spark only: {[r for r in srows if r not in orows][:2]}")
                    print(f"   oracle only: {[r for r in orows if r not in srows][:2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
