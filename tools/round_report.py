#!/usr/bin/env python3
"""Optimization-round report: merge before/after bench sessions
per-side-min (positives only) and print the round's results table.

Usage:
  round_report.py --changed q1,q2,... before1 [before2 ...] -- after1 [after2 ...]

Generalized, guarded successor of r18_report.py (r18 ADVICE: a CHANGED
row absent from one side crashed with KeyError, and an empty untouched
set divided by zero — both now degrade with a 'missing' marker instead).
"""
import json, sys

args = sys.argv[1:]
changed = []
if args and args[0] == "--changed":
    changed = [c for c in args[1].split(",") if c]
    args = args[2:]
sep = args.index("--")
befores = [json.load(open(p)) for p in args[:sep]]
afters = [json.load(open(p)) for p in args[sep + 1:]]

def merge(ds):
    names = set().union(*[set(d) for d in ds]) if ds else set()
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

def fmt(v):
    return f"{v:6.3f}" if v is not None and v > 0 else "  MISS"

print("\nchanged rows (merged min before -> after):")
tot_b = tot_a = 0.0
for n in changed:
    vb, va = b.get(n, -1.0), a.get(n, -1.0)
    d = f"({va - vb:+.3f})" if vb > 0 and va > 0 else "(n/a)"
    print(f"  {n:30s} {fmt(vb)} -> {fmt(va)}  {d}")
    if vb > 0 and va > 0:
        tot_b += vb; tot_a += va
print(f"  {'CHANGED TOTAL (both-side rows)':30s} {tot_b:6.3f} -> {tot_a:6.3f}  "
      f"({tot_a - tot_b:+.3f})")

un = [n for n in names
      if n not in changed and b.get(n, 0) > 0 and a.get(n, 0) > 0]
ub, ua = sum(b[n] for n in un), sum(a[n] for n in un)
if un and ub > 0:
    print(f"\nuntouched rows ({len(un)}): {ub:.1f} -> {ua:.1f} "
          f"({(ua - ub) / ub * 100:+.1f}% — the sessions' host-band delta)")
    moved = sorted(((a[n] - b[n], n) for n in un), key=lambda x: -abs(x[0]))[:10]
    print("largest untouched movers (band indicators):")
    for d, n in moved:
        print(f"  {n:30s} {b[n]:6.3f} -> {a[n]:6.3f}  ({d:+.3f})")
else:
    print("\nuntouched rows: none measurable on both sides")
