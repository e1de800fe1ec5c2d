#!/usr/bin/env python3
"""Adjudicate the r13 slowdown (VERDICT r13 #1): tabulate the 6-run
interleaved A/B (HEAD listener-on x2, HEAD listener-off x2, r12-close
worktree x2) per entry. For each arm the per-entry MIN of its two runs
is the comparable number (same rationale as Bench's two-pass min).
Usage: python3 tools/ab_analyze.py [dir-with-ab_*.json]
"""
import json
import sys
import os


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "target"
    arms = {
        "head_on": ["ab_head_on_1.json", "ab_head_on_2.json"],
        "head_off": ["ab_head_off_1.json", "ab_head_off_2.json"],
        "r12": ["ab_r12_1.json", "ab_r12_2.json"],
    }
    mins, hfs = {}, {}
    for arm, files in arms.items():
        recs = [load(os.path.join(d, f)) for f in files if
                os.path.exists(os.path.join(d, f))]
        if not recs:
            print(f"missing arm {arm}")
            continue
        qs = {}
        for r in recs:
            for k, v in r["queries"].items():
                if v >= 0:
                    qs[k] = min(qs.get(k, 1e9), v)
        mins[arm] = qs
        hfs[arm] = [r.get("host_factor") for r in recs]
    print("host_factors per run:", {a: h for a, h in hfs.items()})
    common = sorted(set.intersection(*(set(v) for v in mins.values())))
    print(f"\n{'entry':28s} {'r12':>6s} {'h_off':>6s} {'h_on':>6s} "
          f"{'on/r12':>7s} {'on/off':>7s}")
    tot = {a: 0.0 for a in mins}
    ratios = []
    for k in common:
        r12, off, on = mins["r12"][k], mins["head_off"][k], mins["head_on"][k]
        for a, v in (("r12", r12), ("head_off", off), ("head_on", on)):
            tot[a] += v
        ratios.append(on / r12 if r12 > 0 else 1.0)
        flag = " <<<" if on > r12 * 1.3 and on - r12 > 0.3 else ""
        print(f"{k:28s} {r12:6.2f} {off:6.2f} {on:6.2f} "
              f"{on / r12 if r12 else 0:7.2f} {on / off if off else 0:7.2f}{flag}")
    ratios.sort()
    n = len(ratios)
    print(f"\ntotals: r12 {tot['r12']:.1f}s  head_off {tot['head_off']:.1f}s  "
          f"head_on {tot['head_on']:.1f}s")
    print(f"on/r12 ratio: median {ratios[n // 2]:.2f}  "
          f"p10 {ratios[n // 10]:.2f}  p90 {ratios[9 * n // 10]:.2f}")
    print(f"listener cost (on vs off totals): "
          f"{(tot['head_on'] / tot['head_off'] - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
