#!/usr/bin/env python3
"""Pairing half of the differential battery (r16): runs the same TSV of
statements on DuckDB, renders cells with the conventions BatteryDump
uses on the Spark side, and diffs the two.  Value comparison is
string-exact except numerics (compared within 1e-9 relative — Java
Double.toString and python repr disagree on exponent formatting, which
is rendering, not value).  Error-vs-error counts as parity (the battery
checks that errors line up; message text is engine-specific).

Usage: battery_compare.py <statements.tsv> <spark_dump.json> [sfDir]
"""
import json
import math
import sys

import duckdb


def render(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join(render(x) for x in v) + "]"
    if isinstance(v, dict):
        # duckdb's python driver fetches MAP values as
        # {'key': [...], 'value': [...]} — render as the map it is
        if set(v.keys()) == {"key", "value"} and isinstance(v["key"], list):
            return "{" + ", ".join(sorted(
                render(k) + "=" + render(x)
                for k, x in zip(v["key"], v["value"]))) + "}"
        return "{" + ", ".join(sorted(render(k) + "=" + render(x)
                                      for k, x in v.items())) + "}"
    if isinstance(v, tuple):
        return "(" + ", ".join(render(x) for x in v) + ")"
    import datetime
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S") + (
            ".%06dZ" % v.microsecond if v.microsecond else "Z")
    return str(v)


def num(s):
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


def cells_equal(a, b):
    if a == b:
        return True
    na, nb = num(a), num(b)
    if na is not None and nb is not None:
        if na == nb:
            return True
        return math.isclose(na, nb, rel_tol=1e-9, abs_tol=1e-12)
    return False


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    return all(len(x) == len(y) and all(cells_equal(c, d)
               for c, d in zip(x, y)) for x, y in zip(a, b))


def main():
    tsv, dump = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    spark = json.load(open(dump))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')")
        except Exception:
            pass
    match = err_parity = diverge = 0
    details = {}
    for line in open(tsv):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        name, sql = line.split("\t", 1)
        sql = sql.replace("\\n", "\n")
        try:
            cur = None
            for stmt in [s for s in sql.split(";") if s.strip()]:
                cur = con.execute(stmt)
            duck = {"ok": True,
                    "rows": [[render(c) for c in r] for r in cur.fetchall()]}
        except Exception as e:
            duck = {"ok": False, "err": str(e)[:300]}
        sp = spark.get(name, {"ok": False, "err": "<missing from dump>"})
        if not duck["ok"] and not sp.get("ok"):
            err_parity += 1
            verdict = "both_error"
        elif duck["ok"] and sp.get("ok") and rows_equal(
                duck["rows"], [r for r in sp.get("rows", [])]):
            match += 1
            verdict = "match"
        else:
            diverge += 1
            verdict = "DIVERGE"
        details[name] = {"verdict": verdict, "duck": duck, "spark": sp}
        if verdict == "DIVERGE":
            print(f"DIVERGE {name}")
            print(f"  duck : {json.dumps(duck)[:400]}")
            print(f"  spark: {json.dumps(sp)[:400]}")
    print(f"\n{match} match, {err_parity} both-error, {diverge} diverge "
          f"of {match + err_parity + diverge}")
    out = dump.replace(".json", "_diff.json")
    json.dump({"match": match, "both_error": err_parity,
               "diverge": diverge, "details": details}, open(out, "w"),
              indent=1)
    print(f"details -> {out}")
    sys.exit(1 if diverge else 0)


if __name__ == "__main__":
    main()
