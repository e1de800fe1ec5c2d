#!/usr/bin/env python3
"""One-off scale-rehearsal data generator (NOT part of the library):
synthesize an ~sf0.3 slice by tripling sf0.1 with CONSISTENT key
offsets, so every foreign-key relationship survives (copy i offsets
custkey/suppkey/partkey/user_id by i*1e6 and orderkey/event_id/doc_id/
vec_id by i*1e7 — the same offset on both sides of every join).
region/nation are dimensions and stay single-copy.

The gate's purpose at this scale is DETERMINISM under 3x rows (cap
binding, accumulation order, invariant drift) — the Spark/DuckDB
compare runs on the same parquet either way, so synthetic provenance
does not weaken it.

Usage: python3 tools/make_sf_multiple.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> target/tmp/sf0.3 (untracked), 3.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/tmp/sf0.3"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3

SMALL = 1_000_000   # custkey / suppkey / partkey / user_id spacing
BIG = 10_000_000    # orderkey / event_id / doc_id / vec_id spacing

# per-table: {column: per-copy offset}; absent column -> unchanged
OFFSETS = {
    "region": None,      # single copy
    "nation": None,      # single copy
    "customer": {"c_custkey": SMALL},
    "supplier": {"s_suppkey": SMALL},
    "part": {"p_partkey": SMALL},
    "orders": {"o_orderkey": BIG, "o_custkey": SMALL},
    "lineitem": {"l_orderkey": BIG, "l_partkey": SMALL, "l_suppkey": SMALL},
    "events": {"event_id": BIG, "user_id": SMALL},
    "documents": {"doc_id": BIG},
    "embeddings": {"vec_id": BIG},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, offs in OFFSETS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if offs is None:
            q = f"SELECT * FROM {src}"
        else:
            cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
            parts = []
            for i in range(N):
                sel = ", ".join(
                    f"{c} + {i * offs[c]} AS {c}" if c in offs and i > 0 else c
                    for c in cols)
                parts.append(f"SELECT {sel} FROM {src}")
            q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
