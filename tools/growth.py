#!/usr/bin/env python3
"""Growth-ratio table between two bench reports (PLANS.md format).

Usage: python3 tools/growth.py <bench_small.json> <bench_big.json> [data_ratio]

Prints a markdown table of per-query best times sorted by growth ratio,
plus a SUPERLINEAR flag on any query whose time grew faster than the
data (ratio > data_ratio, default 10) — the tripwire the scale decades
exist to trip. Reads the {"queries": {...}} best-values map that
graft.Bench persists (round-8 verdict item 1).
"""
import json, sys

def main():
    small, big = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    common = [k for k in qb if k in qs and qs[k] > 0 and qb[k] > 0]
    rows = sorted(((k, qs[k], qb[k], qb[k] / qs[k]) for k in common),
                  key=lambda r: -r[3])
    ts, tb = sum(qs[k] for k in common), sum(qb[k] for k in common)
    print(f"{len(common)} common queries; totals {ts:.1f} s -> {tb:.1f} s "
          f"= {tb/ts:.1f}x for {data_ratio:g}x data\n")
    print("| query | small best | big best | ratio |")
    print("|---|---|---|---|")
    n_super = 0
    for k, a, b, r in rows:
        flag = " **SUPERLINEAR**" if r > data_ratio else ""
        if flag: n_super += 1
        print(f"| {k} | {a:.2f} | {b:.2f} | {r:.2f}{flag} |")
    missing = sorted(set(qs) - set(qb)) + sorted(set(qb) - set(qs))
    if missing:
        print(f"\nnot in both reports: {', '.join(missing)}")
    print(f"\nsuperlinear entries: {n_super}")
    sys.exit(1 if n_super else 0)

if __name__ == "__main__":
    main()
