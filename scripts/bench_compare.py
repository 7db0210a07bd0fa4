#!/usr/bin/env python3
"""Compare two Bench full-JSON artifacts by per-query median.

Usage: bench_compare.py a.json b.json [ratio_threshold=1.10]

Reads the {"queries_full": {...}} / per-query med fields of two Bench
runs (the BENCH_full.json shape with med/min per query, falling back to
plain seconds), prints queries whose medians disagree by more than the
threshold, and the agreement fraction — the round-15 bench-trust gate
("two consecutive solo runs whose per-query medians agree within 10% on
>= 95% of queries").
"""
import json
import sys


def meds(path):
    with open(path) as fh:
        obj = json.load(fh)
    q = obj.get("queries_full") or obj.get("queries") or {}
    out = {}
    for name, v in q.items():
        if isinstance(v, dict):
            out[name] = v.get("med", v.get("min"))
        else:
            out[name] = v
    return out


def main():
    a, b = meds(sys.argv[1]), meds(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.10
    common = sorted(set(a) & set(b))
    bad = []
    for name in common:
        x, y = a[name], b[name]
        if x <= 0 or y <= 0:
            continue
        ratio = max(x, y) / min(x, y)
        if ratio > thr:
            bad.append((ratio, name, x, y))
    bad.sort(reverse=True)
    for ratio, name, x, y in bad:
        print(f"DISAGREE {name}: {x:.3f} vs {y:.3f} ({ratio:.2f}x)")
    n = len(common)
    ok = n - len(bad)
    print(f"== {ok}/{n} medians agree within {thr:.2f}x "
          f"({100.0 * ok / max(n, 1):.1f}%) ==")


if __name__ == "__main__":
    main()
