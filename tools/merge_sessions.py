#!/usr/bin/env python3
"""Merge two or more bench_session duck_interleaved.json files into one
(per-query duck min, union of pass stamps, union of stabilized lists)
so assemble_bench.py can take per-side minima ACROSS sessions — the
round-10 protocol ("three sessions, per-side min") formalized. The
assemble-time mtime rule still applies to the EARLIEST stamp of the
merged set, so every merged session must postdate the last code change.

Usage: merge_sessions.py out.json duck_s1.json duck_s2.json ...
"""
import json, sys

out_path = sys.argv[1]
sessions = [json.load(open(p)) for p in sys.argv[2:]]

queries = {}
for s in sessions:
    for n, v in s["queries"].items():
        if v and v > 0 and (n not in queries or v < queries[n]):
            queries[n] = v

stamps = {}
for i, s in enumerate(sessions, 1):
    for tag, tv in s.get("stamps", {}).items():
        stamps[f"s{i}_{tag}"] = tv

stabilized = sorted(set().union(*[set(s.get("stabilized", [])) for s in sessions]))

json.dump({"metric": "duckdb_total",
           "value": sum(queries.values()),
           "queries": queries,
           "sf": sessions[0].get("sf"),
           "stamps": stamps,
           "stabilized": stabilized,
           "sessions_merged": len(sessions)},
          open(out_path, "w"), indent=1)
print(f"merged {len(sessions)} sessions, {len(queries)} queries -> {out_path}")
