#!/usr/bin/env python3
"""Diff two Bench JSON lines (files containing the {"metric":...} line,
with or without sbt log prefixes): per-query deltas, regressions, and
queries added/removed. Usage: python3 tools/bench_compare.py OLD NEW
"""
import json
import sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


# Idle minima of the pinned control queries under the r10 harness
# (MUST match Bench.controlRef — see its re-pin policy comment). Used
# only as a fallback for records that predate the host_factor field;
# a record's own host_factor always wins. Records from before the r10
# harness change (codegen/relation caches) are not factor-comparable.
CONTROL_REF = {"g_cube": 0.912, "w_distribution": 0.988, "j2_semi_join": 0.265}


def host_factor(rec):
    if "host_factor" in rec:
        return rec["host_factor"]
    q = rec["queries"]
    if all(k in q for k in CONTROL_REF):
        return sum(q[k] for k in CONTROL_REF) / sum(CONTROL_REF.values())
    return None


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    print(f"total: {a['value']:.1f} s -> {b['value']:.1f} s | "
          f"queries: {a.get('n_queries', len(a['queries']))} -> "
          f"{b.get('n_queries', len(b['queries']))} | "
          f"errors: {a.get('n_errors', '?')} -> {b.get('n_errors', '?')}")
    ha, hb = host_factor(a), host_factor(b)
    if ha and hb:
        print(f"host_factor (vs r7 idle): {ha:.2f} -> {hb:.2f} | "
              f"raw ratio {b['value'] / a['value']:.2f}x, "
              f"control-normalized {b['value'] / hb * ha / a['value']:.2f}x")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda k: qa[k] - qb[k])
    regressions = [(qb[k] - qa[k], k) for k in common if qb[k] > qa[k] * 1.3 and qb[k] - qa[k] > 0.3]
    if regressions:
        print("regressions (>30% and >0.3s):")
        for d, k in sorted(regressions, reverse=True):
            print(f"  {k}: {qa[k]:.2f} -> {qb[k]:.2f} (+{d:.2f})")
    else:
        print("no per-query regressions (>30% and >0.3s)")
    added = {k: qb[k] for k in qb if k not in qa}
    removed = sorted(k for k in qa if k not in qb)
    if added:
        print(f"added ({sum(added.values()):.1f} s total): "
              + ", ".join(f"{k}={v:.2f}" for k, v in sorted(added.items())))
    if removed:
        print("removed: " + ", ".join(removed))


if __name__ == "__main__":
    main()
