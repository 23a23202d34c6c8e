#!/usr/bin/env python3
"""Compare two graft.Bench sweep artifacts query by query.

Usage: compare_sweeps.py NEW.json REF.json [--bar RATIO]

Prints per-query NEW/REF ratios (descending), the distribution summary,
and every entry above --bar (default 12, the decade-sweep root-cause
threshold: sf10 carries 10x the rows of sf1, so a >12x wall ratio on a
sub-linear operator needs a named explanation in BASELINE.md).
Exit code 1 if any compared entry exceeds the bar, so a sweep write-up
cannot silently skip the root-causing step.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    return d, qs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("new_json")
    ap.add_argument("ref_json")
    ap.add_argument("--bar", type=float, default=12.0)
    ns = ap.parse_args()
    bar = ns.bar
    args = [ns.new_json, ns.ref_json]
    new_doc, new_q = load(args[0])
    ref_doc, ref_q = load(args[1])
    shared = sorted(set(new_q) & set(ref_q))
    only_new = sorted(set(new_q) - set(ref_q))
    only_ref = sorted(set(ref_q) - set(new_q))
    ratios = sorted(((new_q[q] / ref_q[q] if ref_q[q] > 0 else float("inf"), q)
                     for q in shared), reverse=True)
    print(f"new: {args[0]}  total={new_doc.get('value', 0):.1f}s  n={len(new_q)}")
    print(f"ref: {args[1]}  total={ref_doc.get('value', 0):.1f}s  n={len(ref_q)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")
    if only_ref:
        print(f"only in ref ({len(only_ref)}): {', '.join(only_ref)}")
    vals = [r for r, _ in ratios]
    med = statistics.median(vals) if vals else 0
    print(f"\nshared={len(shared)}  ratio max={vals[0]:.2f} median={med:.2f} "
          f"min={vals[-1]:.2f}" if vals else "no shared queries")
    print(f"\ntop 15 by ratio (new_s / ref_s):")
    for r, q in ratios[:15]:
        print(f"  {q:32s} {new_q[q]:9.3f} / {ref_q[q]:8.3f} = {r:6.2f}x")
    over = [(r, q) for r, q in ratios if r > bar]
    if over:
        print(f"\nENTRIES OVER THE {bar:.0f}x BAR ({len(over)}) — root-cause required:")
        for r, q in over:
            print(f"  {q:32s} {new_q[q]:9.3f} / {ref_q[q]:8.3f} = {r:6.2f}x")
        sys.exit(1)
    print(f"\nall shared entries within the {bar:.0f}x bar")


if __name__ == "__main__":
    main()
