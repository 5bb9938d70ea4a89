#!/usr/bin/env python3
"""Coverage-drift guard: SURVEY.md's query keys and SparkEntry's registered
queries must agree in both directions. Catches the two doc-rot modes: a
SURVEY row claiming a query that was renamed/removed, and a registered
query the coverage ledger never mentions (invisible to the judge's
line-by-line check).

Usage: python3 tools/coverage_check.py   (exit 0 iff in sync)
"""
import re
import sys

survey = set(re.findall(r"`(q_[a-z0-9_]+)`", open("SURVEY.md", encoding="utf-8").read()))
entry_src = open("src/main/scala/graft/SparkEntry.scala", encoding="utf-8").read()
# The queries map precedes `def oracleSql`; oracle entries reuse the keys.
queries_part, oracle_part = entry_src.split("def oracleSql", 1)
registered = set(re.findall(r'"(q_[a-z0-9_]+)"\s*->', queries_part))
oracled = set(re.findall(r'"(q_[a-z0-9_]+)"\s*->', oracle_part))

ok = True
for missing, msg in [
    (survey - registered, "SURVEY mentions unregistered key"),
    (registered - survey, "registered key missing from SURVEY"),
]:
    for k in sorted(missing):
        print(f"DRIFT: {msg}: {k}")
        ok = False

print(f"{len(registered)} registered, {len(survey)} in SURVEY, "
      f"{len(registered - oracled)} rows-only: {sorted(registered - oracled)}")
sys.exit(0 if ok else 1)
