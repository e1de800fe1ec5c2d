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

With --perturb, copies i > 0 also get PERTURBED identities (a
per-copy suffix on documents.text and customer.c_name), separating
"the corpus grew" from "the corpus mass-duplicated": verbatim mode
(default) deliberately stresses dedup/cap regimes (it bound the
fuzzy-join key cap in r11), while --perturb exercises clean 3x growth
where content identities stay unique.

Usage: python3 tools/make_sf_multiple.py [src_dir] [dst_dir] [copies] [--perturb]
Defaults: /root/testdata/sf0.1 -> target/tmp/sf0.3 (untracked), 3.
"""
import sys
import duckdb

args = [a for a in sys.argv[1:] if a != "--perturb"]
PERTURB = "--perturb" in sys.argv[1:]
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
DST = args[1] if len(args) > 1 else "target/tmp/sf0.3"
N = int(args[2]) if len(args) > 2 else 3

SMALL = 1_000_000   # custkey / suppkey / partkey / user_id spacing
BIG = 10_000_000    # orderkey / event_id / doc_id / vec_id spacing

# identity columns perturbed per copy under --perturb (suffix ' cp<i>'
# for text-like content, '~<i>' for names) — keeps content identities
# unique across copies so dedup clusters and blocking-key frequencies
# scale like a real 3x corpus instead of a mass-duplication regime
PERTURB_COLS = {
    "documents": {"text": " cp"},
    "customer": {"c_name": "~"},
}

# embedding perturbation per copy under --perturb (r15, found by the
# sf3.0 rehearsal): verbatim embedding copies put a probe's TRUE
# top-10 at 29 exact duplicates (dist 0), and k-NN under mass ties has
# no deterministic tie-break (MLlib approxNearestNeighbors returns an
# arbitrary subset of the tied class) — the lsh recall gate read 7/10
# against a truth the fixture, not the operator, had corrupted. A
# +i*0.12 per-component shift keeps every copy ≥0.96 L2 from its
# original and from sibling copies — far outside every engineered
# plant offset (≤0.192), the near-dup threshold (0.5), and the
# semantic-dedup/contamination cosine cuts — so rehearsal growth adds
# NEW identities in embedding space, like real growth does.
EMB_STEP = 0.12

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
            pert = PERTURB_COLS.get(t, {}) if PERTURB else {}
            parts = []
            for i in range(N):
                def sel_col(c):
                    if i > 0 and c in offs:
                        return f"{c} + {i * offs[c]} AS {c}"
                    if i > 0 and c in pert:
                        return f"{c} || '{pert[c]}{i}' AS {c}"
                    if i > 0 and PERTURB and t == "embeddings" and c == "embedding":
                        return (f"CAST(list_transform({c}, "
                                f"x -> x + {i * EMB_STEP}) AS FLOAT[]) AS {c}")
                    return c
                sel = ", ".join(sel_col(c) for c in cols)
                parts.append(f"SELECT {sel} FROM {src}")
            q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
