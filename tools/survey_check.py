#!/usr/bin/env python3
"""Cross-check SURVEY.md §2 claims against an actual Verify dump:
every backticked queries-key in the inventory must exist in the
registry, and every registry query must be claimed. Usage:
  python3 tools/survey_check.py <verify_outdir>
(the outdir from `sbt "runMain graft.Verify <sfdir> <outdir>"`)
"""
import os, re, sys

def main():
    outdir = sys.argv[1]
    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    claimed = set()
    for line in survey.splitlines():
        if line.startswith("|") and "`" in line:
            cells = [c.strip() for c in line.split("|")]
            if len(cells) >= 4:
                claimed |= set(re.findall(r"`([a-z0-9_]+)`", cells[3]))
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))
              and not d.startswith("_")}  # _forensics etc. are not queries
    missing = sorted(claimed - dumped)
    unclaimed = sorted(dumped - claimed)
    # q_approx_distinct is documented in prose (rows-only), not a table row
    unclaimed = [q for q in unclaimed if q != "q_approx_distinct"]
    if missing:
        print("SURVEY claims queries missing from the registry:", missing)
    if unclaimed:
        print("registry queries not claimed in SURVEY §2:", unclaimed)
    if not missing and not unclaimed:
        print(f"OK: {len(dumped)} registry queries <-> SURVEY claims consistent")
    sys.exit(1 if (missing or unclaimed) else 0)

main()
