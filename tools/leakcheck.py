#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json with verifiable provenance.

Scans every tracked source/doc file under src/ (plus build.sbt) for
strings that would indicate non-public provenance: imports of
internal-looking namespaces, non-public URLs, cloud-bucket URIs, chat
permalinks, credential-shaped literals, and unexpected environment
variables. The artifact carries run provenance (UTC timestamp, scanned
file count, byte count, tool version, pattern inventory) so a re-run is
distinguishable from a hand-edit — the round-5/6 advisor finding.

Usage: python3 tools/leakcheck.py [--round N] (writes LEAKCHECK.json)
"""
import datetime
import json
import os
import re
import sys

TOOL_VERSION = "2.0"

# Allowlisted public hosts for URLs cited in docs/comments.
PUBLIC_HOSTS = (
    "github.com", "apache.org", "duckdb.org", "arxiv.org", "wikipedia.org",
    "spark.apache.org", "scala-lang.org", "scalatest.org", "microsoft.com",
    "acm.org", "vldb.org", "openproceedings.org", "example.com", "w3.org",
)

PATTERNS = {
    # imports rooted in a company-style namespace that is not the public
    # surface (org.apache/scalatest/scalacheck, scala, java, graft) —
    # local-value imports like `import spark.implicits._` are fine
    "internal-import": re.compile(
        r"^\s*import\s+(?:(?:com|net|io|ai|dev|corp)\.[\w.]+"
        r"|org\.(?!apache\.|scalatest\.|scalacheck\.)[\w.]+)",
        re.M),
    # URLs whose host is not on the public allowlist
    "internal-url": re.compile(r"https?://[^\s\"')>]+"),
    # cloud bucket URIs
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[^\s\"')>]+"),
    # chat permalinks / channel references
    "slack-link": re.compile(r"slack\.com|app\.slack|enterprise\.slack|/archives/C[A-Z0-9]{6,}"),
    # credential-shaped literals (long secrets with key-ish context)
    "api-key": re.compile(
        r"(?i)(api[_-]?key|secret|token|passw(or)?d)\s*[:=]\s*[\"'][A-Za-z0-9+/_-]{16,}[\"']"),
    # env vars outside the documented public set
    "env-var": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_|SCALE_STRESS_|GRAFT_|JAVA_|COURSIER_|HOME|PATH|USER|TMPDIR)[A-Z0-9_]+\""),
}


def scan(root="src", extra=("build.sbt",)):
    files = []
    for base, _dirs, names in os.walk(root):
        for n in sorted(names):
            if n.endswith((".scala", ".md", ".sbt", ".py", ".json")):
                files.append(os.path.join(base, n))
    files += [f for f in extra if os.path.exists(f)]
    hits = {k: [] for k in PATTERNS}
    nbytes = 0
    for f in files:
        text = open(f, encoding="utf-8", errors="replace").read()
        nbytes += len(text)
        for key, rx in PATTERNS.items():
            for m in rx.finditer(text):
                s = m.group(0)
                if key == "internal-url" and any(h in s for h in PUBLIC_HOSTS):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{f}:{line}: {s.strip()[:120]}")
    return files, nbytes, hits


def main():
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    files, nbytes, hits = scan()
    out = {
        "round": rnd,
        "tool": "tools/leakcheck.py",
        "tool_version": TOOL_VERSION,
        "run_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "scanned_files": len(files),
        "scanned_bytes": nbytes,
        "patterns": sorted(PATTERNS),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("LEAKCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"LEAKCHECK: {out['n_hits']} hits over {len(files)} files "
          f"({nbytes} bytes) at {out['run_utc']}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
