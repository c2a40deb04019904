#!/usr/bin/env python3
"""Self-evidencing leak scan (VERDICT r10 #4 / r11 missing #3).

The driver writes its own LEAKCHECK.json without provenance; this local
twin records WHAT was scanned (commit hash, dirty-tree flag, file count),
WHEN (UTC timestamp), and WITH WHICH patterns — so a 0-hit claim is
auditable from the artifact alone. Run from the repo root:

    python3 tools/leakcheck.py            # writes LEAKCHECK_LOCAL.json

Exit code 1 on any hit. Pattern families mirror the driver's categories
(internal imports/packages, internal URLs, buckets, slack links, API
keys, internal env vars) with conservative public-safe allowances:
example.org/example.com fixtures and the Apache Spark namespace.
"""
import json
import os
import re
import subprocess
import sys
import time

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "SURVEY.md", "PLANS.md", "COVERAGE.md", "FIXTURES.md"]
EXTS = {".scala", ".py", ".sbt", ".md", ".json", ".sql", ".yml", ".yaml", ".properties", ".conf"}

PATTERNS = {
    # internal/proprietary package or import roots (Apache/scala/java are fine)
    "internal-import": re.compile(
        r"import\s+(?:com|net|io)\.(?!fasterxml|github)[a-z0-9_]*(?:anthropic|internal|corp|proprietary)[a-z0-9_.]*",
        re.I),
    "internal-pkg": re.compile(r"\b(?:com|io|net)\.anthropic[a-z0-9_.]*", re.I),
    # URLs that are not public documentation/fixture hosts
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:example\.(?:org|com|net)|localhost|127\.0\.0\.1|apache\.org|spark\.apache\.org|github\.com|duckdb\.org|scala-lang\.org|scalatest\.org|en\.wikipedia\.org))[a-z0-9.-]*\.(?:corp|internal|local)\b",
        re.I),
    "go-link": re.compile(r"\bgo/[a-z][a-z0-9_-]{1,40}\b"),
    "slack-link": re.compile(r"(?:slack\.com/archives|#[a-z0-9-]*claude[a-z0-9-]*)", re.I),
    "bucket": re.compile(r"\b(?:s3|gs|s3a|s3n)://(?!example|bucket|my-bucket|test)[a-z0-9._-]+", re.I),
    "api-key": re.compile(r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    "internal-env": re.compile(r"\b(?:AXON|ANTHROPIC)_[A-Z0-9_]+\b"),
}

# fixture allowances: reserved-domain test data is not a leak — but the
# allowance is scoped to the families where a reserved domain can BE the
# match (URLs/buckets). Credential-shaped families are never allowed: an
# API key co-located on a line with an example.com fixture reference must
# still report (ADVICE r13).
ALLOW_LINE = re.compile(r"example\.(?:org|com|net)")
ALLOWABLE_FAMILIES = {"internal-url", "bucket", "go-link"}


def iter_files():
    for d in SCAN_DIRS:
        for root, _, files in os.walk(d):
            if "target" in root.split(os.sep):
                continue
            for fn in files:
                if os.path.splitext(fn)[1] in EXTS:
                    yield os.path.join(root, fn)
    for f in SCAN_FILES:
        if os.path.isfile(f):
            yield f


def main():
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for path in iter_files():
        n_files += 1
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                for ln, line in enumerate(f, 1):
                    for cat, pat in PATTERNS.items():
                        m = pat.search(line)
                        if m and not (cat in ALLOWABLE_FAMILIES
                                      and ALLOW_LINE.search(line)):
                            hits[cat].append(f"{path}:{ln}: {m.group(0)[:80]}")
        except OSError:
            continue

    def git(*args):
        try:
            return subprocess.check_output(["git", *args], text=True).strip()
        except Exception:
            return ""

    n_hits = sum(len(v) for v in hits.values())
    record = {
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": git("rev-parse", "HEAD"),
        "tree_dirty": bool(git("status", "--porcelain")),
        "n_files_scanned": n_files,
        "patterns": {k: v.pattern for k, v in PATTERNS.items()},
        "n_hits": n_hits,
        "hits": hits,
    }
    with open("LEAKCHECK_LOCAL.json", "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"leakcheck: {n_files} files, {n_hits} hits -> LEAKCHECK_LOCAL.json "
          f"@ {record['commit'][:12]}{' (dirty)' if record['tree_dirty'] else ''}")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
