#!/usr/bin/env python3
"""Dev-only: check_oracle.py variant that emits the sf1 correctness
artifact (CORRECTNESS_sf1_rNN.json shape): per-query status/rows/sec,
with a documented exclusion list for oracle-side-intractable queries
(the DuckDB twin's cost, not an engine limit).

Usage: python3 tools/check_oracle_json.py <sfDir> <verifyOutDir> <outJson> \
         [excluded1,excluded2,...]
"""
import sys, json, glob, os, time
import duckdb

def canon(rows):
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return sorted(tuple(norm(v) for v in r) for r in rows)

def main(sf_dir, out_dir, out_json, excluded):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in excluded:
            result[name] = {"status": "excluded_oracle_intractable"}
            print(f"SKIP {name} (documented oracle-side exclusion)")
            continue
        t0 = time.time()
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            srows = canon([[r[i] for i in sidx] for r in sdf])
            orows = canon([[r[i] for i in oidx] for r in odf])
            sec = round(time.time() - t0, 1)
            if sorted(scols) != sorted(ocols):
                result[name] = {"status": "fail_schema", "sec": sec}
                n_fail += 1
            elif srows != orows:
                result[name] = {"status": "fail_rows",
                                "spark_rows": len(srows),
                                "oracle_rows": len(orows), "sec": sec}
                n_fail += 1
            else:
                result[name] = {"status": "pass", "rows": len(srows), "sec": sec}
            print(f"{result[name]['status'].upper()} {name} ({len(srows)} rows, {sec}s)")
        except Exception as e:
            result[name] = {"status": "error",
                            "err": str(e)[:200],
                            "sec": round(time.time() - t0, 1)}
            n_fail += 1
            print(f"ERROR {name}: {e}")
    json.dump(result, open(out_json, "w"), indent=1, sort_keys=True)
    n_pass = sum(1 for v in result.values() if v["status"] == "pass")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(excluded)} excluded -> {out_json}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    excl = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], excl))
