#!/usr/bin/env python3
"""Time DuckDB executing each oracle query at a given SF (the baseline the
judge holds BENCH_r{N}.json against). Usage: bench_duck.py [sf_dir] [out]"""
import duckdb, glob, json, os, sys, time

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else 'target/verify_out'
con = duckdb.connect()
con.execute("SET threads TO 8")
for p in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(p).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
# optional subset (comma list) for threshold-row stabilization passes
only = [s for s in os.environ.get('DUCK_ONLY', '').split(',') if s]
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
times = {}
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()  # warm
        t0 = time.time()
        con.execute(sql).fetchall()
        times[name] = time.time() - t0
    except Exception as e:
        times[name] = -1
total = sum(v for v in times.values() if v > 0)
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": times, "sf": sf}))
