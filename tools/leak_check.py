#!/usr/bin/env python3
"""Regenerable leak-check scan over src/ (same seven categories as LEAKCHECK.json).

Scans all tracked source under src/ for strings that would indicate
non-public provenance: internal package imports, internal URLs/hosts,
cloud bucket references, chat short-links, credential-shaped tokens,
and internal environment variables. Public Spark/Hadoop/JDK imports and
"cited, not copied" scaladoc references to the public reference repo are
expected and not flagged.

Usage: python3 tools/leak_check.py [--round N] > LEAKCHECK.json
"""
import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Category -> regex. Applied line-by-line to every file under src/.
PATTERNS = {
    # Fully-qualified imports outside the sanctioned namespaces (spark/hadoop/jdk/
    # scala/own pkg/test libs). Relative imports (`import spark.implicits._`,
    # `import QualityOps._`) are in-file references, not external deps — not matched.
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|org)\.(?!apache\.(?:spark|hadoop|parquet|commons|log4j)"
        r"|scalatest|scalacheck|slf4j|fasterxml|xerial|codehaus|roaringbitmap|junit)"
    ),
    # URLs outside apache/github/w3 and the obviously-synthetic fixture hosts.
    # Any subdomain of the RFC-2606 example domains is synthetic by
    # construction (cdn.example.com, siteN.example.com, sub.www.example.com —
    # the crawl-fixture hosts), as is a bare `http://site` literal whose host
    # is completed dynamically by a fixture expression.
    "internal-url": re.compile(
        r"https?://(?!www\.apache\.org|apache\.org|spark\.apache\.org|hadoop\.apache\.org"
        r"|github\.com|raw\.githubusercontent\.com|www\.w3\.org|maven\.apache\.org|duckdb\.org"
        r"|localhost|127\.0\.0\.1|(?:[\w.-]+\.)?example\.(?:com|org)\b"
        r"|site[/'\"]|x\.y/|\[)\S+"  # `[` = regex literal, not a URL
    ),
    # Non-public package roots that would signal copied proprietary code
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.(?:velox|dicl)\b|\binternal\.(?:corp|infra)\b"),
    # Object-store buckets
    "internal-bucket": re.compile(r"\b(?:s3|s3a|s3n|gs|abfss?|wasbs?)://[\w.-]+"),
    # Chat short-links
    "slack-link": re.compile(r"\bslack\.com/|\bgo/[a-z][\w-]{2,}\b|#[a-z][\w-]*-(?:eng|infra|oncall)\b"),
    # Credential-shaped tokens
    "api-key": re.compile(r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{30,}|xox[bap]-)"),
    # Environment variables other than the sanctioned bench/test knobs
    "axon-env": re.compile(
        r"""sys\.env\(\s*"(?!SPARK_GRAFT_SF_DIR|GRAFT_)[^"]+"\s*\)"""
    ),
}


def tracked_src_files():
    out = subprocess.run(
        ["git", "-C", str(REPO), "ls-files", "src"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    return [f for f in out if f.endswith((".scala", ".java", ".py", ".sql", ".conf"))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "-C", str(REPO), "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    hits = {k: [] for k in PATTERNS}
    for rel in tracked_src_files():
        for i, line in enumerate((REPO / rel).read_text(errors="replace").splitlines(), 1):
            for cat, rx in PATTERNS.items():
                if rx.search(line):
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")

    record = {
        "round": args.round,
        "commit": head,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(record, sys.stdout, indent=2)
    print()
    return 1 if record["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
