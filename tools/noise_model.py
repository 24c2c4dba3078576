#!/usr/bin/env python3
"""Bench-host noise model (round-14 verdict #5): three rounds of watch-row
adjudications leaned on a narrative "co-tenant band"; this quantifies it
once from N repeated SAME-CODE passes. Feed it per-query dump files
(spark Bench SPARK_GRAFT_DUMP dumps, and/or bench_duck.py pass dumps) and
it prints per-row mean / sd / CV plus the distribution of CVs, so the
watch rule can be restated in sigma terms.

Usage: noise_model.py label file1.json file2.json ...
Each file: either a flat {query: sec} dict or a bench JSON with a
"queries" key.
"""
import json, statistics, sys

label = sys.argv[1]
files = sys.argv[2:]
runs = []
for f in files:
    j = json.load(open(f))
    q = j.get('queries', j)
    runs.append({k: v for k, v in q.items() if isinstance(v, (int, float)) and v > 0})

common = set(runs[0])
for r in runs[1:]:
    common &= set(r)

rows = []
for q in sorted(common):
    vals = [r[q] for r in runs]
    m = statistics.mean(vals)
    sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
    rows.append((q, m, sd, sd / m if m > 0 else 0.0, min(vals), max(vals)))

rows.sort(key=lambda r: -r[3])
print(f'== {label}: {len(files)} passes, {len(common)} common rows ==')
print(f'{"query":34s} {"mean_s":>8s} {"sd_s":>8s} {"cv":>6s} {"min":>8s} {"max":>8s}')
for q, m, sd, cv, lo, hi in rows[:15]:
    print(f'{q:34s} {m:8.3f} {sd:8.3f} {cv:6.2f} {lo:8.3f} {hi:8.3f}')
cvs = sorted(r[3] for r in rows)


def pct(p):
    return cvs[min(len(cvs) - 1, int(p * len(cvs)))]


print(f'CV percentiles: p50={pct(.5):.3f} p75={pct(.75):.3f} '
      f'p90={pct(.9):.3f} p95={pct(.95):.3f} max={cvs[-1]:.3f}')
# rows that matter for ratio adjudication: duck-min >= 0.1s class is
# decided by the CALLER; here report the heavier rows' band
heavy = [r for r in rows if r[1] >= 0.1]
hcvs = sorted(r[3] for r in heavy)
if hcvs:
    print(f'rows with mean >= 0.1s: n={len(hcvs)}, median CV='
          f'{hcvs[len(hcvs)//2]:.3f}, p90 CV={hcvs[min(len(hcvs)-1, int(.9*len(hcvs)))]:.3f}')
tot = [sum(r.values()) for r in runs]
print(f'totals per pass: {[f"{t:.1f}" for t in tot]} '
      f'(mean {statistics.mean(tot):.1f}, CV {statistics.stdev(tot)/statistics.mean(tot):.3f})'
      if len(tot) > 1 else f'total {tot[0]:.1f}')
