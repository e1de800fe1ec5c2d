#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the Scala
library): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query output parquet in <outDir>, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same testdata parquet tables, then
compare: schema (column names sorted), row count, and values (exact for
ints/strings, bitwise for floats — the strictest plausible driver compare).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb

def _tag(x):
    # r7 lesson: the driver's compare distinguishes int64 from float64
    # (DuckDB sum(int) -> HUGEINT -> pandas float64), so 1002 != 1002.0
    # there. Tag numeric scalars with their Python type so the local
    # mirror fails the same way instead of passing on == coercion.
    if isinstance(x, bool):
        return x
    if isinstance(x, float):
        return ("f", "NaN") if math.isnan(x) else ("f", x)
    if isinstance(x, int):
        return ("i", x)
    return x

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, list):
                v = tuple(_tag(round(x, 9)) if isinstance(x, float) else _tag(x)
                          for x in v)
            else:
                v = _tag(v)
            vals.append(v)
        out.append(tuple(vals))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # optional resource bounds for rehearsal-scale runs (r15: two
    # concurrent compares' spills transiently filled the disk and one
    # DuckDB aborted the whole process with a C++ IO exception — cap
    # memory so spills start earlier but stay bounded, and point temp
    # at a scratch dir that is observable/cleanable)
    if os.environ.get("VERIFY_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['VERIFY_DUCKDB_MEM']}'")
    if os.environ.get("VERIFY_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['VERIFY_DUCKDB_THREADS'])}")
    if os.environ.get("VERIFY_DUCKDB_TEMP"):
        os.makedirs(os.environ["VERIFY_DUCKDB_TEMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['VERIFY_DUCKDB_TEMP']}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_fail = n_noracle = 0
    # identical oracle SQL -> one evaluation (r14 ADVICE): entries that
    # SHARE a truth by design (dd_minhash_lsh / st_stream_minhash use
    # one oracle string so their plants can't drift apart) would
    # otherwise pay it twice - ~25 min each at rehearsal SFs. Only SQL
    # that actually repeats is retained: memoizing every result would
    # hold the whole gate's rows in RAM at once (GBs at rehearsal SFs)
    # for no benefit.
    from collections import Counter
    # count uses only among entries that HAVE a dump: an oracle shared
    # with a failed (undumped) entry would otherwise never reach zero
    # uses and its memoized result would sit in RAM to process end
    dumped_names = {os.path.basename(p)
                    for p in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(p)}
    sql_uses = Counter(v for k, v in oracle.items() if k in dumped_names)
    oracle_memo = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(grows)} rows")
            n_noracle += 1
            continue
        try:
            sql = oracle[name]
            if sql in oracle_memo:
                ecols, erows = oracle_memo[sql]
            else:
                exp = con.execute(sql)
                ecols = [d[0] for d in exp.description]
                erows = exp.fetchall()
                if sql_uses[sql] > 1:
                    oracle_memo[sql] = (ecols, erows)
            # evict after the LAST consumer: without this, several full
            # result sets (GB-scale at rehearsal SFs) sit in RAM for the
            # rest of the run; with it, peak memo memory is one shared
            # result set at a time (r14 ADVICE)
            sql_uses[sql] -= 1
            if sql in oracle_memo and sql_uses[sql] <= 0:
                del oracle_memo[sql]
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"  [FAIL-cols] {name}: spark={sorted(gcols)} duckdb={sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"  [FAIL-rows] {name}: spark={len(grows)} duckdb={len(erows)}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        # compare both order-sensitively and as multisets
        mismatch = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if mismatch:
            i = mismatch[0]
            print(f"  [FAIL-vals] {name}: {len(mismatch)}/{len(g)} rows differ; first @{i}:")
            print(f"      spark : {g[i]}")
            print(f"      duckdb: {e[i]}")
            n_fail += 1
        else:
            print(f"  [OK       ] {name}: {len(g)} rows")
            n_ok += 1
    # entries with an oracle but NO dump are failed/missing queries —
    # count them red instead of silently skipping (r11: a failed entry
    # now deletes its stale dump, so absence is the failure signal)
    dumped = {os.path.basename(q) for q in glob.glob(os.path.join(out_dir, "*"))
              if os.path.isdir(q)}
    for name in sorted(set(oracle) - dumped):
        print(f"  [FAIL-miss] {name}: no spark dump (query failed?)")
        n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
