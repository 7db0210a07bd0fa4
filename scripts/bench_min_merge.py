#!/usr/bin/env python3
"""Merge N same-stage ServeBench runs into contention-floor rows.

Usage: bench_min_merge.py '<corpus label>' run1.jsonl [run2.jsonl ...]

Each input is the line-JSON a ServeBench stage prints (one {"stage": ...}
object per line, possibly preceded by a {"corpus": ...} header). The box
these artifacts are recorded on shows rare but large transient spikes
(10-20x on a single measurement between two back-to-back solo runs), so a
single-run row is not a usable cross-round artifact. This emits, per
stage, ONE row whose timing fields (*sec*) are the MINIMUM across runs —
the contention-free floor, the same field Bench records as "min" — with
all other fields (bytes, recall, counts: deterministic given the corpus)
taken from the first run, plus "runs": N. Output goes to stdout with the
given corpus label as the header line.
"""
import json
import sys


def main() -> None:
    label, files = sys.argv[1], sys.argv[2:]
    runs = []
    for f in files:
        rows = {}
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                if "stage" in obj:
                    rows[obj["stage"]] = obj
        runs.append(rows)
    print(json.dumps({"corpus": label, "protocol":
                      f"min over {len(runs)} solo runs (contention floor)"}))
    for stage, first in runs[0].items():
        merged = dict(first)
        for k, v in first.items():
            if isinstance(v, (int, float)) and "sec" in k:
                vals = [r[stage][k] for r in runs
                        if stage in r and k in r[stage]]
                merged[k] = min(vals)
        merged["runs"] = sum(1 for r in runs if stage in r)
        print(json.dumps(merged))


if __name__ == "__main__":
    main()
