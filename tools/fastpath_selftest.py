#!/usr/bin/env python3
"""Self-test for verify_local's giant-result digest fast path (r16).

Two layers:

1. Planted trips on a synthetic fixture covering every supported type
   class — each case asserts the fast path's verdict EQUALS the python
   tuple compare's verdict on the same data (equal where python ==
   equates: -0.0 vs 0.0, NaN vs NaN, decimal scale, 9-dp list floats;
   unequal where it distinguishes: int-vs-float cross-class, one-ulp
   scalar doubles, value/row tweaks), plus the documented fall-back on
   an unsupported (struct) column.

2. Full-dump parity sweep (optional args: <sfDir> <outDir>): runs the
   whole gate compare twice — python path (VERIFY_FASTPATH_ROWS very
   high) and forced fast path (=1) — and asserts identical ok/fail
   tallies with identical per-entry verdicts.

Usage: python3 tools/fastpath_selftest.py [sfDir outDir]
"""
import os, sys, json, subprocess, re, collections
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import verify_local as VL


def trip_cases():
    # (name, spark_rows_sql, oracle_sql, expect_ok)
    # each side is a DuckDB SELECT producing the same schema
    return [
        ("identical_mixed",
         "SELECT * FROM (VALUES (1::BIGINT, 'a', 1.5::DOUBLE, TRUE), "
         "(2, 'b', -2.25, FALSE)) t(k, s, v, b)",
         "SELECT * FROM (VALUES (1::BIGINT, 'a', 1.5::DOUBLE, TRUE), "
         "(2, 'b', -2.25, FALSE)) t(k, s, v, b)", True),
        ("value_tweak",
         "SELECT 1::BIGINT AS k, 1.5::DOUBLE AS v",
         "SELECT 1::BIGINT AS k, 1.5000001::DOUBLE AS v", False),
        ("row_dropped",
         "SELECT * FROM (VALUES (1::BIGINT), (2)) t(k)",
         "SELECT 1::BIGINT AS k", False),
        ("int_vs_float_class",
         "SELECT 1002::BIGINT AS v",
         "SELECT 1002.0::DOUBLE AS v", False),
        ("int_width_irrelevant",
         "SELECT 7::INTEGER AS v",
         "SELECT 7::HUGEINT AS v", True),
        ("decimal_scale_equal",
         "SELECT 5.10::DECIMAL(10,2) AS v",
         "SELECT 5.1::DECIMAL(12,4) AS v", True),
        ("decimal_vs_int_class",
         "SELECT 5::DECIMAL(10,2) AS v",
         "SELECT 5::BIGINT AS v", False),
        ("neg_zero_equal",
         "SELECT (-0.0)::DOUBLE AS v",
         "SELECT 0.0::DOUBLE AS v", True),
        ("nan_equal",
         "SELECT 'nan'::DOUBLE AS v",
         "SELECT 'nan'::DOUBLE AS v", True),
        ("scalar_double_one_ulp",
         "SELECT 0.1::DOUBLE AS v",
         "SELECT (0.1::DOUBLE + 1.1102230246251565e-17) AS v", False),
        ("list_float_9dp_rounds_equal",
         "SELECT [1.00000000012::DOUBLE, 2.0] AS v",
         "SELECT [1.00000000013::DOUBLE, 2.0] AS v", True),
        ("list_float_differs",
         "SELECT [1.001::DOUBLE] AS v",
         "SELECT [1.002::DOUBLE] AS v", False),
        ("list_int_equal",
         "SELECT [1::BIGINT, 2, 3] AS v",
         "SELECT [1::BIGINT, 2, 3] AS v", True),
        ("list_len_differs",
         "SELECT [1::BIGINT, 2] AS v",
         "SELECT [1::BIGINT, 2, 3] AS v", False),
        ("null_scalar_equal",
         "SELECT NULL::DOUBLE AS v, 1::BIGINT AS k",
         "SELECT NULL::DOUBLE AS v, 1::BIGINT AS k", True),
        ("null_vs_value",
         "SELECT NULL::DOUBLE AS v",
         "SELECT 0.0::DOUBLE AS v", False),
        ("date_equal",
         "SELECT DATE '2020-01-02' AS d",
         "SELECT DATE '2020-01-02' AS d", True),
        ("timestamp_equal",
         "SELECT TIMESTAMP '2020-01-02 03:04:05.123456' AS t",
         "SELECT TIMESTAMP '2020-01-02 03:04:05.123456' AS t", True),
        ("varchar_differs",
         "SELECT 'abc' AS s",
         "SELECT 'abd' AS s", False),
        ("bool_vs_int_class",
         "SELECT TRUE AS v",
         "SELECT 1::BIGINT AS v", False),
        ("multiset_duplicate_count",
         "SELECT * FROM (VALUES (1::BIGINT), (1), (2)) t(k)",
         "SELECT * FROM (VALUES (1::BIGINT), (2), (2)) t(k)", False),
    ]


def run_trips():
    con = duckdb.connect()
    base = "target/tmp/fastpath_selftest"
    os.makedirs(base, exist_ok=True)
    bad = 0
    for name, ssql, osql, expect_ok in trip_cases():
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        con.execute(f"COPY ({ssql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")
        uses = collections.Counter({osql: 1})
        res = VL._fast_compare(con, name,
                               f"SELECT * FROM read_parquet('{d}/*.parquet')",
                               osql, {}, uses)
        if res is None:
            print(f"TRIP-BAD  {name}: fast path fell back (expected verdict)")
            bad += 1
        elif res != expect_ok:
            print(f"TRIP-BAD  {name}: fastpath={res} expected={expect_ok}")
            bad += 1
        else:
            print(f"trip-ok   {name}: verdict {res} as expected")
    # unsupported type -> documented python fall-back
    d = os.path.join(base, "struct_fallback")
    os.makedirs(d, exist_ok=True)
    con.execute(f"COPY (SELECT {{'a': 1}} AS v) TO '{d}/part-0.parquet' (FORMAT PARQUET)")
    res = VL._fast_compare(con, "struct_fallback",
                           f"SELECT * FROM read_parquet('{d}/*.parquet')",
                           "SELECT {'a': 1} AS v", {},
                           collections.Counter({"SELECT {'a': 1} AS v": 1}))
    if res is not None:
        print(f"TRIP-BAD  struct_fallback: expected fall-back, got {res}")
        bad += 1
    else:
        print("trip-ok   struct_fallback: fell back to python path as documented")
    return bad


def run_refusal_trip(sf_dir):
    """r17 VERDICT #5: above VERIFY_REFUSE_ROWS a fastpath refusal must
    report FAIL-resource (exit 1), never fetchall() a giant; below it
    the documented python fall-back still runs and passes."""
    here = os.path.dirname(os.path.abspath(__file__))
    base = "target/tmp/fastpath_selftest_refusal"
    d = os.path.join(base, "zz_struct_giant")
    os.makedirs(d, exist_ok=True)
    ssql = "SELECT {'a': x} AS v, x AS k FROM range(0, 5) t(x)"
    duckdb.connect().execute(
        f"COPY ({ssql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")
    json.dump({"zz_struct_giant": ssql + " ORDER BY k"},
              open(os.path.join(base, "oracle_sql.json"), "w"))
    vl = [sys.executable, os.path.join(here, "verify_local.py"), sf_dir, base]
    bad = 0
    p = subprocess.run(vl, capture_output=True, text=True,
                       env=dict(os.environ, VERIFY_FASTPATH_ROWS="1",
                                VERIFY_REFUSE_ROWS="2"))
    if "[FAIL-resource]" not in p.stdout or p.returncode == 0:
        print(f"TRIP-BAD  refusal: expected FAIL-resource + exit 1, got "
              f"rc={p.returncode}\n{p.stdout}")
        bad += 1
    else:
        print("trip-ok   refusal: giant unsupported-type result refused "
              "(FAIL-resource), no python fetchall")
    p = subprocess.run(vl, capture_output=True, text=True,
                       env=dict(os.environ, VERIFY_FASTPATH_ROWS="1",
                                VERIFY_REFUSE_ROWS="1000"))
    if "[OK       ] zz_struct_giant" not in p.stdout or p.returncode != 0:
        print(f"TRIP-BAD  refusal: small result should python-fall-back OK, "
              f"got rc={p.returncode}\n{p.stdout}")
        bad += 1
    else:
        print("trip-ok   refusal: below the threshold the python fall-back "
              "still compares (and passes)")
    return bad


def _verdicts(txt):
    v = {}
    for line in txt.splitlines():
        m = re.match(r"\s*\[(OK[^\]]*|FAIL[^\]]*|rows-only)\s*\]\s+(\S+?):", line)
        if m:
            v[m.group(2)] = m.group(1).split("-")[0].strip()
    return v


def run_parity(sf_dir, out_dir):
    here = os.path.dirname(os.path.abspath(__file__))
    outs = {}
    for label, thr in [("python", "1000000000000"), ("fast", "1")]:
        env = dict(os.environ, VERIFY_FASTPATH_ROWS=thr)
        p = subprocess.run([sys.executable, os.path.join(here, "verify_local.py"),
                            sf_dir, out_dir], capture_output=True, text=True, env=env)
        outs[label] = _verdicts(p.stdout)
        tail = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "(no output)"
        print(f"parity[{label}]: {tail}")
    diff = {k for k in set(outs["python"]) | set(outs["fast"])
            if outs["python"].get(k) != outs["fast"].get(k)}
    for k in sorted(diff):
        print(f"PARITY-BAD {k}: python={outs['python'].get(k)} fast={outs['fast'].get(k)}")
    return len(diff)


def main():
    bad = run_trips()
    bad += run_refusal_trip(sys.argv[1] if len(sys.argv) > 2
                            else "/root/testdata/sf0.001")
    if len(sys.argv) > 2:
        bad += run_parity(sys.argv[1], sys.argv[2])
    print(f"== fastpath selftest: {'PASS' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
