#!/usr/bin/env python3
"""Merge two graft.Bench JSON lines (sf0.1 baseline and the ScaleGen 100x
corpus) into the SCALING.md measurement table.

Usage: python3 scripts/scaling_report.py <bench_sf01.json> <bench_sfL.json>

Prints a markdown table: per query, seconds at each scale, the wall-clock
ratio, and the ratio normalized by the 100x input growth (1.0 = perfectly
linear scaling; < 1 = better than linear, usually fixed overhead amortizing;
> 1 = super-linear, needs a root cause).

Driver-side tooling only — not a library dependency.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("[info] "):
                line = line[len("[info] "):]
            if line.startswith('{"metric"'):
                d = json.loads(line)
                if "queries" in d:
                    return d["queries"]
    raise SystemExit(f"no bench line in {path}")


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    rows = []
    for q in sorted(set(base) & set(big)):
        b, l = base[q], big[q]
        if b <= 0 or l <= 0:
            rows.append((q, b, l, None))
            continue
        rows.append((q, b, l, l / b))
    print("| query | sf0.1 s | 100x s | wall ratio | vs linear |")
    print("|---|---|---|---|---|")
    for q, b, l, r in rows:
        if r is None:
            print(f"| {q} | {b:.2f} | {l:.2f} | FAILED | — |")
        else:
            print(f"| {q} | {b:.2f} | {l:.2f} | {r:.1f}x | {r / factor:.2f} |")


if __name__ == "__main__":
    main()
