#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json over the same sf tables.

Usage: python3 tools/compare.py [sf_dir] [verify_out_dir]
"""
import duckdb, glob, json, os, sys
import numpy as np
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else 'target/verify_out'

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(p).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
rows_only = [d for d in sorted(os.listdir(out))
             if os.path.isdir(f'{out}/{d}') and d not in oracle]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # datetimes → ns, ints → int64 for cross-engine dtype stability
    import datetime
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, datetime.date) or v is None).all() and df[c].notnull().any():
            df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('float64') if df[c].isnull().any() else df[c].astype('int64')
    # plain sort_values like the driver: nested cells (list/ndarray/dict)
    # raise TypeError here — exactly the driver's failure mode, so any
    # query emitting array/map/struct columns fails LOCALLY first
    df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)

only = os.environ.get('SPARK_GRAFT_ONLY')
if only:  # local iteration subset: skip oracle entries that weren't dumped
    keep = {s.strip() for s in only.split(',')}
    oracle = {k: v for k, v in oracle.items() if k in keep}
    rows_only = [d for d in rows_only if d in keep]

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pq.read_table(f'{out}/{name}').to_pandas()
    except Exception as e:
        print(f'FAIL {name}: no spark output ({e})'); n_fail += 1; continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f'FAIL {name}: oracle error: {e}'); n_fail += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f'FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}'); n_fail += 1; continue
    if len(a) != len(b):
        print(f'FAIL {name}: rows spark={len(a)} duck={len(b)}'); n_fail += 1; continue
    bad = []
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
            ok = np.allclose(x.fillna(1.23456e300), y.fillna(1.23456e300), rtol=1e-9, atol=1e-12)
        else:
            if x.dtype != y.dtype:
                bad.append(f'{c}: dtype {x.dtype} vs {y.dtype}'); continue
            ok = x.map(repr).equals(y.map(repr)) if x.dtype == object else x.equals(y)
        if not ok:
            diff = (x != y) if x.dtype != object else (x.map(repr) != y.map(repr))
            i = int(np.argmax(diff.values))
            bad.append(f'{c}: first diff row {i}: spark={x.iloc[i]!r} duck={y.iloc[i]!r}')
    if bad:
        print(f'FAIL {name}: ' + ' | '.join(bad[:3])); n_fail += 1
    else:
        print(f'PASS {name} ({len(a)} rows)'); n_pass += 1

for name in rows_only:
    try:
        # driver canonicalizes (sorts) even rows-only dumps — nested
        # columns crash it there too, so replicate that locally
        n = len(canon(pq.read_table(f'{out}/{name}').to_pandas()))
        print(f'ROWS {name}: {n} rows {"OK" if n > 0 else "EMPTY!"}')
    except Exception as e:
        print(f'ROWS {name}: FAIL canon/read error {e}'); n_fail += 1

print(f'\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only')
sys.exit(1 if n_fail else 0)
