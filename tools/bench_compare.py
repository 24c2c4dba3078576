#!/usr/bin/env python3
"""Join per-query Spark times (Bench SPARK_GRAFT_DUMP output) with per-query
DuckDB times (bench_duck.py output) and emit a ratio report.

Usage: bench_compare.py spark_dump.json duck_bench.json [out_md]
Prints worst ratios (spark/duck) and writes a markdown table when out_md
is given. Queries without a DuckDB time (non-SQL-expressible contract
checks) are listed separately.
"""
import json, sys

spark = json.load(open(sys.argv[1]))
duck_raw = json.load(open(sys.argv[2]))
duck = duck_raw["queries"] if "queries" in duck_raw else duck_raw

rows = []
for name, s in spark.items():
    d = duck.get(name, -1)
    if s is None or s < 0:
        continue
    if d and d > 0:
        rows.append((name, s, d, s / d))
rows.sort(key=lambda r: -r[3])

over = [r for r in rows if r[3] > 2.0]
print(f"{len(rows)} queries compared; {len(over)} above the 2x bar")
print(f"spark total {sum(r[1] for r in rows):.1f}s  duck total {sum(r[2] for r in rows):.1f}s  "
      f"aggregate ratio {sum(r[1] for r in rows)/sum(r[2] for r in rows):.3f}")
print(f"{'query':36s} {'spark':>8s} {'duck':>8s} {'ratio':>8s}")
for name, s, d, r in rows[:25]:
    print(f"{name:36s} {s:8.3f} {d:8.3f} {r:8.2f}")

if len(sys.argv) > 3:
    with open(sys.argv[3], "w") as f:
        f.write("| query | spark (s) | duckdb (s) | ratio |\n|---|---|---|---|\n")
        for name, s, d, r in rows[:10]:
            f.write(f"| {name} | {s:.3f} | {d:.3f} | {r:.2f} |\n")
