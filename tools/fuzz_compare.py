#!/usr/bin/env python3
"""Cross-engine half of the dialect fuzz (round-8 verdict #2): DuckDB
executes the SAME generated dialect statements natively (QUALIFY,
DISTINCT ON, star EXCLUDE/REPLACE, SIMILAR TO, COLLATE, macros,
PREPARE/EXECUTE are all native DuckDB syntax) and results are compared
against FuzzDump's Spark parquet dumps with the driver-style canon
(column sort, dtype normalization, row sort, float tolerance).

Usage: fuzz_compare.py [sf_dir] [fuzz_out_dir]
Exit 1 on any mismatch. Writes FUZZCHECK summary line to stdout.
"""
import duckdb, glob, json, os, sys
import numpy as np
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else 'target/fuzz_out'

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(p).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

manifest = json.load(open(f'{out}/fuzz_manifest.json'))


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('float64') if df[c].isnull().any() else df[c].astype('int64')
    df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


n_pass = n_fail = 0
for name, case in sorted(manifest.items()):
    try:
        spark_df = pq.read_table(f'{out}/{name}').to_pandas()
    except Exception as e:
        print(f'FAIL {name}: no spark dump ({e})'); n_fail += 1; continue
    try:
        for s in case['setup']:
            con.execute(s)
        duck_df = con.execute(case['sql']).df()
    except Exception as e:
        print(f'FAIL {name}: duckdb error: {e}\n  {case["sql"]}'); n_fail += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f'FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}')
        n_fail += 1; continue
    if len(a) != len(b):
        print(f'FAIL {name}: rows spark={len(a)} duck={len(b)}\n  {case["sql"]}')
        n_fail += 1; continue
    ok = True
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
            same = np.allclose(x.fillna(1.23456e300), y.fillna(1.23456e300),
                               rtol=1e-9, atol=1e-12)
        else:
            # normalize null rendering first: pandas nullable dtypes
            # stringify NA as '<NA>' while object columns give 'None'
            # (boolean-with-NULL columns arrived with the r16 3VL shape)
            xs = x.astype(object).where(pd.notnull(x), 'NULL').astype(str)
            ys = y.astype(object).where(pd.notnull(y), 'NULL').astype(str)
            same = xs.equals(ys)
        if not same:
            print(f'FAIL {name}: col {c} differs\n  {case["sql"]}')
            ok = False; break
    if ok:
        n_pass += 1

print(f'FUZZCHECK {n_pass} pass, {n_fail} fail of {len(manifest)}')
sys.exit(1 if n_fail else 0)
