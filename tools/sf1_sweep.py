#!/usr/bin/env python3
"""Format the sf0.1-vs-sf1 heavy-query sweep for SCALE.md.

Inputs are two graft.Bench outputs (the JSON line, possibly with sbt
log prefixes) produced with SPARK_GRAFT_BENCH_ONLY set to the heavy
subset: one against /root/testdata/sf0.1, one against the
GenScale-generated sf1 dir (10x rows). alpha = log10(t_sf1 / t_sf0.1):
1.0 = linear in data, > 1.05 flagged super-linear.

    python3 tools/sf1_sweep.py bench_sf01.txt bench_sf1.txt
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        for line in f:
            if '"metric"' in line and "{" in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no bench JSON line in {path}")


def main(f01, f1):
    b01, b1 = load(f01), load(f1)
    rows = []
    for q in sorted(b01["queries"]):
        t01, t1 = b01["queries"][q], b1["queries"].get(q)
        if t1 is None or t01 <= 0 or t1 <= 0:
            continue
        rows.append((q, t01, t1, math.log10(t1 / t01)))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > 1.05]
    print("| query | sf0.1 | sf1 (GenScale, 10x) | alpha |")
    print("|---|---|---|---|")
    for q, t01, t1, a in rows:
        print(f"| {q} | {t01:.3f} | {t1:.3f} | {a:.2f} |")
    print()
    if flagged:
        print("FLAGGED super-linear:", [r[0] for r in flagged])
    else:
        print("No query super-linear (alpha > 1.05).")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
