#!/usr/bin/env python3
"""Regenerate COPYCHECK.json with verifiable provenance.

Measures literal-copy similarity between every non-test Scala source
file and the reference amalgamation (/root/reference): normalized
5-line shingles (whitespace collapsed, comments stripped) of each repo
file are probed against the shingle set of the reference's C++/header
sources; a file whose shingle-overlap fraction exceeds the threshold is
flagged. The artifact carries run provenance (UTC timestamp, file and
shingle counts, tool version) so a re-run is distinguishable from a
hand-edit.

Usage: python3 tools/copycheck.py [--round N] (writes COPYCHECK.json)
"""
import datetime
import json
import os
import re
import sys

TOOL_VERSION = "2.0"
THRESHOLD = 0.6
SHINGLE = 5

COMMENT = re.compile(r"//.*?$|/\*.*?\*/", re.S | re.M)
WS = re.compile(r"\s+")


def norm_lines(text):
    text = COMMENT.sub("", text)
    out = []
    for ln in text.splitlines():
        ln = WS.sub(" ", ln).strip()
        if len(ln) >= 8:  # skip braces/blank — they match everything
            out.append(ln)
    return out


def shingles(lines):
    return {hash(tuple(lines[i:i + SHINGLE])) for i in range(len(lines) - SHINGLE + 1)}


def main():
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    ref_sh = set()
    ref_files = 0
    for base, _d, names in os.walk("/root/reference"):
        for n in sorted(names):
            if n.endswith((".cpp", ".hpp", ".h", ".c", ".cc", ".rs", ".go", ".java")):
                ref_files += 1
                txt = open(os.path.join(base, n), encoding="utf-8",
                           errors="replace").read()
                ref_sh |= shingles(norm_lines(txt))
    flagged = []
    scores = {}
    repo_files = []
    for base, _d, names in os.walk("src/main"):
        for n in sorted(names):
            if n.endswith(".scala"):
                p = os.path.join(base, n)
                repo_files.append(p)
                sh = shingles(norm_lines(open(p, encoding="utf-8",
                                              errors="replace").read()))
                frac = len(sh & ref_sh) / len(sh) if sh else 0.0
                scores[p] = round(frac, 4)
                if frac > THRESHOLD:
                    flagged.append({"file": p, "similarity": round(frac, 4)})
    out = {
        "round": rnd,
        "tool": "tools/copycheck.py",
        "tool_version": TOOL_VERSION,
        "run_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "threshold": THRESHOLD,
        "shingle_lines": SHINGLE,
        "reference_files": ref_files,
        "reference_shingles": len(ref_sh),
        "scanned_files": len(repo_files),
        "max_similarity": max(scores.values()) if scores else 0.0,
        "flagged": flagged,
    }
    with open("COPYCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"COPYCHECK: {len(flagged)} flagged of {len(repo_files)} files; "
          f"max similarity {out['max_similarity']} at {out['run_utc']}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
