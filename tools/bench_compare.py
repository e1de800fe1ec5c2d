#!/usr/bin/env python3
"""Diff two Bench JSON lines (files containing the {"metric":...} line,
with or without sbt log prefixes): per-query deltas, regressions, and
queries added/removed. Usage: python3 tools/bench_compare.py OLD NEW
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


# set when the mixed heavy-pin divergence check fires; main() exits 3
_mixed_pin_tripped = False


# Idle minima of the pinned control queries under the r10 harness.
# Since r11 the bench record carries its own pins ("control_ref"), so
# this literal is only the fallback for r10-harness records written
# before that field existed. Records from before the r10 harness change
# (codegen/relation caches sped the controls up for non-host reasons)
# are NOT factor-comparable — the fallback is gated on the record
# having the r10-harness query count (>= 180) so a pre-r10 pair prints
# "not factor-comparable" instead of laundering harness wins into
# host weather (r10 advice).
CONTROL_REF = {"g_cube": 0.912, "w_distribution": 0.988, "j2_semi_join": 0.265}


def host_factor(rec, ref):
    """Control-min sum of `rec` against the pin set `ref`. The factor is
    recomputed from the record's own control-query times rather than
    trusting rec["host_factor"]: two records written under DIFFERENT
    pin bases (a future re-pin) carry stored factors that are not
    mutually comparable, so a comparison must rebase both on ONE ref
    (r11 review: the stored-field shortcut made control_ref dead code
    and would have laundered a re-pin into 'host weather')."""
    q = rec["queries"]
    n = rec.get("n_queries", len(q))
    if "control_ref" not in rec and "host_factor" not in rec and n < 180:
        return None  # pre-r10 harness: controls not comparable
    if all(k in q for k in ref):
        return sum(q[k] for k in ref) / sum(ref.values())
    return None


def plan_diff(pa, pb):
    """Diff two per-entry plan-metric maps (old -> new). Exchange /
    broadcast / scan counts flag on ANY change; shuffle volume flags on
    >1.5x growth past noise floors; any NEW spill flags. These are
    code+data properties — a flagged change is real even when every
    wall-time moved with the VM."""
    common_p = sorted(set(pa) & set(pb))
    regress, improve = [], []
    for k in common_p:
        ma, mb = pa[k], pb[k]
        for f in ("exchanges", "broadcasts", "scans"):
            va, vb = ma.get(f, 0), mb.get(f, 0)
            if vb > va:
                regress.append(f"{k}: {f} {va} -> {vb}")
            elif vb < va:
                improve.append(f"{k}: {f} {va} -> {vb}")
        ra, rb = ma.get("shuffle_rows", 0), mb.get("shuffle_rows", 0)
        if rb > ra * 1.5 + 1000:
            regress.append(f"{k}: shuffle_rows {ra} -> {rb}")
        ba, bb = ma.get("shuffle_bytes", 0), mb.get("shuffle_bytes", 0)
        if bb > ba * 1.5 and bb - ba > 1 << 20:
            regress.append(f"{k}: shuffle_bytes {ba} -> {bb}")
        if mb.get("spill_bytes", 0) > 0 and ma.get("spill_bytes", 0) == 0:
            regress.append(f"{k}: NEW spill {mb['spill_bytes']} bytes")
        # streaming vectors (r14): batch count is exact-deterministic —
        # ANY change flags; state/input/sink rows are deterministic at a
        # fixed sf, so a >10% move is real (a batch-splitting or state-
        # retention change), not noise
        sa, sb = ma.get("st_batches", 0), mb.get("st_batches", 0)
        if sa != sb and (sa or sb):
            regress.append(f"{k}: st_batches {sa} -> {sb}")
        for f in ("st_input_rows", "st_state_rows", "st_sink_rows"):
            va, vb = ma.get(f, 0), mb.get(f, 0)
            if (va or vb) and abs(vb - va) > 0.1 * max(va, 1):
                regress.append(f"{k}: {f} {va} -> {vb}")
    if regress:
        print("PLAN regressions (weather-immune — real even if times look flat):")
        for r in regress:
            print("  " + r)
    else:
        print(f"no plan regressions across {len(common_p)} common entries")
    if improve:
        print("plan improvements: " + "; ".join(improve))
    only_new = sorted(set(pb) - set(pa))
    if only_new:
        print(f"plan rows only in the newer record ({len(only_new)}): "
              + ", ".join(only_new))
    only_old = sorted(set(pa) - set(pb))
    if only_old:
        # an entry that VANISHED from the newer record is itself a
        # regression signal (dropped registration, failed both passes)
        print(f"WARNING: plan rows MISSING from the newer record "
              f"({len(only_old)}): " + ", ".join(only_old))
    return bool(regress)


def baseline_mode(argv):
    """Default mode (VERDICT r13 #3): with zero or one args, diff a
    record's plan map against the COMMITTED PLAN_BASELINE.json — the
    tracked reference vector the deterministic metrics exist to serve.
    `bench_compare.py` -> target/bench_last.json vs the baseline;
    `bench_compare.py REC` -> REC vs the baseline. Exits 1 on any plan
    regression so a round close can gate on it."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_path = os.path.join(root, "PLAN_BASELINE.json")
    rec_path = argv[0] if argv else os.path.join(root, "target", "bench_last.json")
    base = json.load(open(base_path))
    rec = load(rec_path)
    prec = rec.get("plan")
    if not prec:
        print(f"ERROR: {rec_path} carries no plan map — Bench's plan "
              "emission regressed or this is a truncated stdout line")
        sys.exit(2)
    bsf, rsf = base.get("sf", ""), str(rec.get("sf", ""))
    if bsf and bsf not in rsf:
        print(f"WARNING: baseline is pinned at sf '{bsf}' but the record ran "
              f"'{rsf}' — shuffle rows/bytes are sf-dependent, counts still hold")
    print(f"plan-vector diff: {base.get('source', base_path)} (baseline) -> {rec_path}")
    if plan_diff(base["plan"], prec):
        sys.exit(1)


def main():
    if len(sys.argv) < 3:
        baseline_mode(sys.argv[1:])
        return
    a, b = load(sys.argv[1]), load(sys.argv[2])
    # the STDOUT bench line truncates `queries` to the top-40 so the
    # driver's ~2000-char tail capture stays parseable; a compare fed
    # that line reports ~150 phantom "removed" entries and loses the
    # control queries. The full record is target/bench_last.json.
    for rec, tag in ((a, sys.argv[1]), (b, sys.argv[2])):
        if rec.get("queries_shown", 0) and \
                rec["queries_shown"] < rec.get("n_queries", 0):
            print(f"WARNING: {tag} holds the TRUNCATED stdout line "
                  f"({rec['queries_shown']} of {rec['n_queries']} queries) — "
                  f"use target/bench_last.json for per-query compares")
    print(f"total: {a['value']:.1f} s -> {b['value']:.1f} s | "
          f"queries: {a.get('n_queries', len(a['queries']))} -> "
          f"{b.get('n_queries', len(b['queries']))} | "
          f"errors: {a.get('n_errors', '?')} -> {b.get('n_errors', '?')}")
    # one COMMON pin base for both records: prefer the newer record's
    # in-record pins, then the older record's, then the r10 literal —
    # and SAY which was chosen (r11 advice: the label claimed "r10 idle
    # pins" even when a record's own control_ref was the base)
    if "control_ref" in b:
        ref, src = b["control_ref"], "newer record's control_ref"
    elif "control_ref" in a:
        ref, src = a["control_ref"], "older record's control_ref"
    else:
        ref, src = CONTROL_REF, "r10 idle-pin literal"
    ha, hb = host_factor(a, ref), host_factor(b, ref)
    if ha and hb:
        print(f"host_factor (vs {src}): {ha:.2f} -> {hb:.2f} | "
              f"raw ratio {b['value'] / a['value']:.2f}x, "
              f"control-normalized {b['value'] / hb * ha / a['value']:.2f}x")
        # heavy pins (r14): CPU-saturating controls that DO see sustained
        # burst-credit throttle the light scans miss. Same rebase
        # discipline: one common heavy_ref for both records. light flat +
        # heavy elevated = sustained throttle; both flat but seconds
        # moved = read the plan diff below.
        href = b.get("heavy_ref") or a.get("heavy_ref")
        if href:
            hha, hhb = host_factor(a, href), host_factor(b, href)
            if hha and hhb:
                print(f"host_factor_heavy: {hha:.2f} -> {hhb:.2f} | "
                      f"heavy-normalized {b['value'] / hhb * hha / a['value']:.2f}x"
                      + ("  [sustained-throttle regime: heavy/light drift "
                         f"{(hhb / hb) / (hha / ha):.2f}x]"
                         if (hhb / hb) / (hha / ha) > 1.15 else ""))
            # mixed-pin signal (r14 ADVICE): host weather moves all three
            # heavy pins TOGETHER; ONE pin diverging sharply from its
            # siblings means that entry's own code/plan changed — the
            # factor is laundering a real per-entry delta into "weather"
            # and heavyRef must be re-pinned (Bench.scala RE-PIN POLICY;
            # HeavyPinSpec enforces the plan-vector side of the chain).
            for rec, tag in ((a, sys.argv[1]), (b, sys.argv[2])):
                rr = {k: rec["queries"][k] / href[k] for k in href
                      if rec.get("queries", {}).get(k, -1) > 0}
                if len(rr) == len(href) >= 2:
                    hi, lo = max(rr.values()), min(rr.values())
                    if lo > 0 and hi / lo > 1.5:
                        print(f"ERROR: mixed heavy-pin signal in {tag}: "
                              + ", ".join(f"{k}={v:.2f}x"
                                          for k, v in sorted(rr.items()))
                              + " — one pin diverges from its siblings; that"
                              " is a code/plan change IN the pin, not host"
                              " weather. Re-pin per Bench.scala RE-PIN"
                              " POLICY before trusting host_factor_heavy."
                              " (exit 3; BENCH_ALLOW_MIXED_PINS=1 to"
                              " downgrade for a forensic read)")
                        global _mixed_pin_tripped
                        _mixed_pin_tripped = True
    else:
        print("host_factor: not factor-comparable (pre-r10 record without pins)")
        # a stored factor we can't rebase is IGNORED, not trusted —
        # surface that instead of silently printing nothing (r11 advice)
        for rec, tag in ((a, "old"), (b, "new")):
            if "host_factor" in rec and host_factor(rec, ref) is None:
                print(f"  note: {tag} record stores host_factor="
                      f"{rec['host_factor']} but its queries map lacks the "
                      f"control queries — stored factor ignored (not "
                      f"rebase-able on {src})")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda k: qa[k] - qb[k])
    regressions = [(qb[k] - qa[k], k) for k in common if qb[k] > qa[k] * 1.3 and qb[k] - qa[k] > 0.3]
    if regressions:
        print("regressions (>30% and >0.3s):")
        for d, k in sorted(regressions, reverse=True):
            print(f"  {k}: {qa[k]:.2f} -> {qb[k]:.2f} (+{d:.2f})")
    else:
        print("no per-query regressions (>30% and >0.3s)")
    # deterministic plan metrics (r13): exchange counts / shuffle volume /
    # spill are code+data properties, immune to host weather — a flagged
    # change here is REAL even when every wall-time moved with the VM
    pa, pb = a.get("plan"), b.get("plan")
    if pa and pb:
        plan_diff(pa, pb)
    elif pb and not pa:
        print("plan metrics: only the newer record carries them "
              "(older is a pre-r13 baseline) — seconds-only compare above")
    elif pa and not pb:
        # the reverse asymmetry is a Bench REGRESSION, not a baseline
        # quirk: the newer record stopped emitting the plan map and the
        # compare silently degraded to seconds-only (r13 ADVICE)
        print("WARNING: the NEWER record carries no plan metrics but the "
              "older does — Bench's plan emission regressed; this compare "
              "is seconds-only and weather-blind")
    added = {k: qb[k] for k in qb if k not in qa}
    removed = sorted(k for k in qa if k not in qb)
    if added:
        print(f"added ({sum(added.values()):.1f} s total): "
              + ", ".join(f"{k}={v:.2f}" for k, v in sorted(added.items())))
    if removed:
        print("removed: " + ", ".join(removed))
    # a tripped mixed-pin signal exits nonzero BY DEFAULT (r16, VERDICT
    # r15 #6): a pin diverging >1.5x from its siblings is never weather,
    # and a warning nobody reads defeats the whole pin chain
    import os
    if _mixed_pin_tripped and os.environ.get("BENCH_ALLOW_MIXED_PINS") != "1":
        sys.exit(3)


if __name__ == "__main__":
    main()
