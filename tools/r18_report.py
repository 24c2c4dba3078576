#!/usr/bin/env python3
"""r18 optimization round: merge before/after bench sessions per-side-min
(positives only) and print the round's results table for
OPTIMIZATION_r18.md. Usage: r18_report.py before1 [before2 ...] -- after1 [after2 ...]
"""
import json, sys

sep = sys.argv.index("--")
befores = [json.load(open(p)) for p in sys.argv[1:sep]]
afters = [json.load(open(p)) for p in sys.argv[sep + 1:]]

def merge(ds):
    names = set().union(*[set(d) for d in ds])
    out = {}
    for n in names:
        ts = [d[n] for d in ds if n in d and d[n] is not None and d[n] > 0]
        out[n] = min(ts) if ts else -1.0
    return out

b, a = merge(befores), merge(afters)
names = sorted(set(b) | set(a))
tb = sum(v for v in b.values() if v > 0)
ta = sum(v for v in a.values() if v > 0)
print(f"merged before total {tb:.1f} s ({len(befores)} sessions); "
      f"merged after total {ta:.1f} s ({len(afters)} sessions); n={len(names)}")
fails_b = [n for n in names if b.get(n, -1) <= 0]
fails_a = [n for n in names if a.get(n, -1) <= 0]
print("before fails:", fails_b, " after fails:", fails_a)

CHANGED = ["pipeline_leakage_safe_split", "pipeline_end2end", "agg_mad",
           "agg_approx_distinct", "agg_distinct", "text_langid",
           "dedup_prefix_filter", "dedup_components", "dedup_canonicalize",
           "agg_quantile", "agg_quantile_disc_sem"]
print("\nchanged rows (merged min before -> after):")
for n in CHANGED:
    d = a[n] - b[n]
    print(f"  {n:30s} {b[n]:6.3f} -> {a[n]:6.3f}  ({d:+.3f})")
ch = sum(b[n] for n in CHANGED), sum(a[n] for n in CHANGED)
print(f"  {'CHANGED TOTAL':30s} {ch[0]:6.3f} -> {ch[1]:6.3f}  ({ch[1]-ch[0]:+.3f})")

un = [n for n in names if n not in CHANGED and b.get(n, 0) > 0 and a.get(n, 0) > 0]
ub, ua = sum(b[n] for n in un), sum(a[n] for n in un)
print(f"\nuntouched rows ({len(un)}): {ub:.1f} -> {ua:.1f} "
      f"({(ua-ub)/ub*100:+.1f}% — the sessions' host-band delta)")
moved = sorted(((a[n]-b[n], n) for n in un), key=lambda x: -abs(x[0]))[:10]
print("largest untouched movers (band indicators):")
for d, n in moved:
    print(f"  {n:30s} {b[n]:6.3f} -> {a[n]:6.3f}  ({d:+.3f})")
