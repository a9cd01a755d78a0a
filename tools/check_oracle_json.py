#!/usr/bin/env python3
"""Dev-only: check_oracle.py variant that emits the sf1 correctness
artifact (CORRECTNESS_sf1_rNN.json shape): per-query status/rows/sec,
with a documented exclusion list for oracle-side-intractable queries
(the DuckDB twin's cost, not an engine limit).

Usage: python3 tools/check_oracle_json.py <sfDir> <verifyOutDir> <outJson> \
         [excl1[=reason],excl2[=reason],...] \
         [full1=sampled1,full2=sampled2,...] \
         [digest1,digest2,...]

Excluded entries may carry an inline `=reason` (spaces allowed, commas
not) recorded verbatim on the excluded_oracle_intractable entry, so
the emitted record is self-describing.

The 5th arg maps a full-scale query to its `_sampled` twin: the full
query's DuckDB replay is intractable at replica scale, so its entry is
graded by the sampled twin (the COMPLETE chain over a deterministic
xxhash64 sub-corpus, itself hash-replayed in the twin SQL). The full
query's Spark output rows are still recorded from the verify dump.

The 6th arg lists queries graded in DIGEST mode: exact multiset
equality via (row count, sum of per-row hashes) computed entirely
inside DuckDB — for replica-scale outputs (10M–60M rows) where
materializing both sides into Python tuples for the sort-canon
compare would need tens of GB. Both sides are hashed by the SAME
expression (columns sorted by name, each cast to VARCHAR inside
DuckDB, NULL sentinel), so the check is as engine-neutral as the
canon path; an order-independent hash SUM over equal counts is a
multiset-equality certificate up to 2^-64-scale collision odds.
"""
import sys, json, glob, os, time
import multiprocessing
import queue as pyqueue
import duckdb

def canon(rows):
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return sorted(tuple(norm(v) for v in r) for r in rows)

def digest_of(con, view):
    """(sorted cols, row count, order-independent row-hash sum) of a view.

    Each column contributes its value (empty-string default) AND an
    explicit IS NULL flag, so a NULL can never collide with any literal
    string value (a bare sentinel like '@NULL@' could).
    """
    cols = [r[0] for r in con.execute(f"DESCRIBE {view}").fetchall()]
    expr = " || '|' || ".join(
        f"coalesce((\"{c}\")::VARCHAR, '') || (\"{c}\" IS NULL)::VARCHAR"
        for c in sorted(cols))
    n, h = con.execute(
        f"SELECT count(*), sum(hash({expr})::HUGEINT) FROM {view}").fetchone()
    return sorted(cols), n, h


def fresh_con(sf_dir):
    """New in-memory connection with the fixture views + spill config.

    One connection per QUERY, not per run: after a heavy twin, DuckDB's
    untracked allocations (list/string aggregates fall outside
    memory_limit accounting) linger on the connection, and subsequent
    trivial queries die with "Failed to allocate block of 2048 bytes"
    even on a quiet box. A fresh connection releases everything; view
    registration over parquet is lazy and costs milliseconds.

    An in-memory connection also has NO temp_directory, so heavy twins
    would abort instead of spilling — point spill at disk and cap the
    resident budget (overridable: DUCK_MEM / DUCK_TMP).
    """
    con = duckdb.connect()
    tmp = os.environ.get("DUCK_TMP", os.path.abspath("target/duck_tmp"))
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '48GB')}'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con


def grade_query(sf_dir, out_dir, name, sql, use_digest):
    """Grade ONE query on a fresh connection; returns its result dict."""
    t0 = time.time()
    try:
        con = fresh_con(sf_dir)
        if use_digest:
            con.execute(
                "CREATE OR REPLACE TEMP VIEW _dig_s AS SELECT * FROM "
                f"read_parquet('{out_dir}/{name}/*.parquet')")
            con.execute(f"CREATE OR REPLACE TEMP VIEW _dig_o AS {sql}")
            scols, sn, sh = digest_of(con, "_dig_s")
            ocols, on_, oh = digest_of(con, "_dig_o")
            sec = round(time.time() - t0, 1)
            if scols != ocols:
                return {"status": "fail_schema", "sec": sec}
            if (sn, sh) != (on_, oh):
                return {"status": "fail_digest", "spark_rows": sn,
                        "oracle_rows": on_, "sec": sec}
            return {"status": "pass_digest", "rows": sn, "sec": sec}
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
            return {"status": "fail_schema", "sec": sec}
        if srows != orows:
            return {"status": "fail_rows", "spark_rows": len(srows),
                    "oracle_rows": len(orows), "sec": sec}
        return {"status": "pass", "rows": len(srows), "sec": sec}
    except Exception as e:
        return {"status": "error", "err": str(e)[:200],
                "sec": round(time.time() - t0, 1)}


def _grade_child(q, args):
    q.put(grade_query(*args))


def grade_isolated(sf_dir, out_dir, name, sql, use_digest):
    """grade_query in a child PROCESS. A heavy twin leaves the parent
    allocator unable to serve even KB-scale requests afterwards
    (retained/fragmented pages survive duckdb connection close), so
    with DUCK_ISOLATE=1 each query gets a throwaway process.
    """
    ctx = multiprocessing.get_context("fork")
    q = ctx.Queue()
    p = ctx.Process(target=_grade_child,
                    args=(q, (sf_dir, out_dir, name, sql, use_digest)))
    p.start()
    # Poll rather than block for the full timeout: a child that dies
    # without enqueueing a result (OOM-kill) is detected within seconds
    # instead of stalling the run for DUCK_QUERY_TIMEOUT per dead query.
    deadline = time.time() + int(os.environ.get("DUCK_QUERY_TIMEOUT", "7200"))
    res = None
    while res is None:
        try:
            res = q.get(timeout=5)
        except pyqueue.Empty:
            if not p.is_alive():
                try:  # drain once more: exit can race the final put
                    res = q.get(timeout=1)
                except pyqueue.Empty:
                    res = {"status": "error", "err": "isolated grading child "
                           f"died without a result (exitcode={p.exitcode})"}
            elif time.time() > deadline:
                p.terminate()
                res = {"status": "error",
                       "err": "isolated grading timed out (child killed)"}
    p.join(5)
    if p.is_alive():
        p.terminate()
    return res


def main(sf_dir, out_dir, out_json, excluded, sampled_map=None, digest=None):
    sampled_map = sampled_map or {}
    digest = digest or set()
    isolate = os.environ.get("DUCK_ISOLATE", "0") == "1"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    n_fail = 0
    deferred = []
    for name, sql in sorted(oracle.items()):
        if name in excluded:
            result[name] = {"status": "excluded_oracle_intractable"}
            if excluded[name]:
                result[name]["reason"] = excluded[name]
            print(f"SKIP {name} (documented oracle-side exclusion)")
            continue
        if name in sampled_map:
            deferred.append(name)
            continue
        grader = grade_isolated if isolate else grade_query
        r = grader(sf_dir, out_dir, name, sql, name in digest)
        result[name] = r
        if not r["status"].startswith("pass"):
            n_fail += 1
            print(f"{r['status'].upper()} {name}: {r.get('err', '')}")
        else:
            print(f"{r['status'].upper()} {name} "
                  f"({r.get('rows')} rows, {r.get('sec')}s)")
        sys.stdout.flush()
    con = fresh_con(sf_dir)
    # full-scale queries graded via their sampled twin: the twin entry
    # (checked above) carries the hash verdict; the full entry records
    # the Spark-side row count at full scale plus the twin's result.
    for name in deferred:
        via = sampled_map[name]
        twin = result.get(via, {"status": "missing_sampled_twin"})
        try:
            full_rows = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
        except Exception:
            full_rows = None
        # startswith, not ==: a digest-graded twin reports pass_digest
        ok = twin.get("status", "").startswith("pass")
        result[name] = {
            "status": "pass_sampled_twin" if ok else "fail_sampled_twin",
            "via": via,
            "sampled_rows": twin.get("rows"),
            "spark_full_rows": full_rows,
        }
        if not ok:
            n_fail += 1
        print(f"{result[name]['status'].upper()} {name} "
              f"(via {via}: {twin.get('status')}; full spark rows={full_rows})")
    json.dump(result, open(out_json, "w"), indent=1, sort_keys=True)
    n_pass = sum(1 for v in result.values()
                 if v["status"].startswith("pass"))
    print(f"\n{n_pass} pass ({sum(1 for v in result.values() if v['status'] == 'pass_sampled_twin')} via sampled twin, "
          f"{sum(1 for v in result.values() if v['status'] == 'pass_digest')} via digest), "
          f"{n_fail} fail, {len(excluded)} excluded -> {out_json}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # excluded arg: comma-separated `name` or `name=reason` entries —
    # the reason (spaces fine, commas not) is stamped on the entry.
    excl = {}
    if len(sys.argv) > 4 and sys.argv[4]:
        for item in sys.argv[4].split(","):
            name, _, reason = item.partition("=")
            excl[name] = reason or None
    smap = dict(kv.split("=") for kv in sys.argv[5].split(",")) \
        if len(sys.argv) > 5 and sys.argv[5] else {}
    dig = set(sys.argv[6].split(",")) if len(sys.argv) > 6 and sys.argv[6] else set()
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], excl, smap, dig))
