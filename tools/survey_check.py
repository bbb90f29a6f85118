#!/usr/bin/env python3
"""Cross-check SURVEY.md §2 claims against an actual Verify dump AND
the source tree: every backticked queries-key in the inventory must
exist in the registry, every registry query must be claimed, and —
the dead-code guard — every GraftQuery("name", ...) defined anywhere
under src/main must actually be registered (reachable from
SparkEntry.queries, i.e. present in the Verify dump). A finished
operator that never enters the registry is unverified code presented
as done (the round-6 ObservabilityExt18/LlmPipelineExt14 failure
class). Usage:
  python3 tools/survey_check.py <verify_outdir>
(the outdir from `sbt "runMain graft.Verify <sfdir> <outdir>"`)
"""
import os, re, sys

REPO = os.path.join(os.path.dirname(__file__), "..")

def src_defined():
    """Every query name constructed as GraftQuery("<name>", ...) in main sources."""
    names = set()
    for root, _, files in os.walk(os.path.join(REPO, "src", "main", "scala")):
        for f in files:
            if not f.endswith(".scala"):
                continue
            text = open(os.path.join(root, f)).read()
            names |= set(re.findall(r'GraftQuery\(\s*"([a-z0-9_]+)"', text))
    return names

def main():
    outdir = sys.argv[1]
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    claimed = set()
    ids = []
    for line in survey.splitlines():
        if line.startswith("|"):
            cells = [c.strip() for c in line.split("|")]
            # §2 row ids (C12 / M48c / L7...) must be UNIQUE — a duplicated
            # id makes two different rows indistinguishable in the verdict
            # tables (the r12 M48c defect); ids are keyed here so it can't
            # recur silently
            if len(cells) >= 4 and re.fullmatch(r"[A-Z]\d+[a-z]?", cells[1]):
                ids.append(cells[1])
            if "`" in line and len(cells) >= 4:
                claimed |= set(re.findall(r"`([a-z0-9_]+)`", cells[3]))
    dup_ids = sorted({i for i in ids if ids.count(i) > 1})
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))
              and not d.startswith("_")}  # _forensics etc. are not queries
    defined = src_defined()
    missing = sorted(claimed - dumped)
    unclaimed = sorted(dumped - claimed)
    # q_approx_distinct is documented in prose (rows-only), not a table row
    unclaimed = [q for q in unclaimed if q != "q_approx_distinct"]
    dead = sorted(defined - dumped)          # written but never registered
    unsurveyed = sorted(defined - claimed - {"q_approx_distinct"})
    if missing:
        print("SURVEY claims queries missing from the registry:", missing)
    if unclaimed:
        print("registry queries not claimed in SURVEY §2:", unclaimed)
    if dead:
        print("GraftQuery defined in src/ but NOT registered in SparkEntry "
              "(dead code — wire it or delete it):", dead)
    if unsurveyed:
        print("GraftQuery defined in src/ with no SURVEY §2 row:", unsurveyed)
    if dup_ids:
        print("SURVEY §2 has duplicated row ids (relabel them):", dup_ids)
    bad = missing or unclaimed or dead or unsurveyed or dup_ids
    if not bad:
        print(f"OK: {len(dumped)} registry queries <-> SURVEY claims <-> "
              f"{len(defined)} src definitions consistent "
              f"({len(ids)} unique row ids)")
    sys.exit(1 if bad else 0)

main()
