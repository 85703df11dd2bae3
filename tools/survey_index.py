#!/usr/bin/env python3
"""Regenerate SURVEY.md §2d (the complete declared-query index) from
SparkEntry.scala.

Reads every source file as UTF-8 TEXT (the previous grep-based pass
tripped ripgrep's binary heuristic on superscript characters in
LlmOps.scala comments and emitted empty citations). For each
`"q_name" -> (Obj.method _)` entry, the implementation cell is the
`def method` site in src/main/scala/graft (file:line); the check cell is
hash-oracle iff the query has an `oracleSql` entry, else rows-only.

Usage: python3 tools/survey_index.py          # rewrites SURVEY.md in place
       python3 tools/survey_index.py --check  # exit 1 if SURVEY.md is stale
"""
import re, sys, glob, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "src/main/scala/graft/SparkEntry.scala")
SURVEY = os.path.join(REPO, "SURVEY.md")
SRC = os.path.join(REPO, "src/main/scala/graft")

HEADER = """### 2d. Complete declared-query index (generated from SparkEntry)

One row per `SparkEntry.queries` entry; "check" is the driver gate
(hash-oracle = DuckDB differential; rows-only queries each have a
hash-verified twin noted in §2c). Regenerate with
`python3 tools/survey_index.py`.

| query | implementation | check |
|---|---|---|
"""


def parse_entry():
    src = open(ENTRY, encoding="utf-8").read()
    qm = re.search(r"def queries.*?=\s*Map\((.*?)\n  \)", src, re.S)
    om = re.search(r"def oracleSql.*?=\s*Map\((.*?)\n  \)", src, re.S)
    queries = dict(re.findall(r'"(q_\w+)"\s*->\s*\((\w+\.\w+) _\)', qm.group(1)))
    oracles = set(re.findall(r'"(q_\w+)"\s*->', om.group(1)))
    return queries, oracles


def def_sites():
    sites = {}
    for path in glob.glob(os.path.join(SRC, "**/*.scala"), recursive=True):
        rel = os.path.relpath(path, SRC)
        for i, line in enumerate(
                open(path, encoding="utf-8", errors="strict"), start=1):
            m = re.search(r"\bdef (\w+)\(", line)
            if m:
                # first definition wins; method names are unique per object
                # and SparkEntry references are unambiguous in practice
                sites.setdefault(m.group(1), f"{rel}:{i}")
    return sites


def render():
    queries, oracles = parse_entry()
    sites = def_sites()
    rows = []
    missing = []
    for name in sorted(queries):
        method = queries[name].split(".")[1]
        site = sites.get(method)
        if site is None:
            missing.append((name, method))
            site = ""
        check = "hash-oracle" if name in oracles else "rows-only"
        rows.append(f"| {name} | `{site}` | {check} |")
    if missing:
        sys.exit(f"FATAL: no def site found for {missing}")
    return HEADER + "\n".join(rows) + "\n"


def main():
    block = render()
    survey = open(SURVEY, encoding="utf-8").read()
    # replace from the §2d heading up to the next --- separator
    pat = re.compile(r"### 2d\. Complete declared-query index.*?(?=\n---\n)", re.S)
    if not pat.search(survey):
        sys.exit("FATAL: SURVEY.md §2d block not found")
    updated = pat.sub(block.rstrip("\n") + "\n", survey)
    if "--check" in sys.argv:
        if updated != survey:
            sys.exit("STALE: SURVEY.md §2d is out of date — run tools/survey_index.py")
        print("§2d up to date")
        return
    open(SURVEY, "w", encoding="utf-8").write(updated)
    n = block.count("\n| q_")
    empty = block.count("``")
    print(f"wrote {n} rows, {empty} empty citations")


if __name__ == "__main__":
    main()
