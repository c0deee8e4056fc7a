#!/usr/bin/env python3
"""Recompute the cross-round r2-anchor ratio from COMMITTED artifacts.

The honest cross-round perf signal is the query subset preserved in
BENCH_r02.json's (truncated) tail compared against the committed clean
count-action r8 anchor tools/bench_reference_count_r8.json (BOTH sides
must be the count action — the canonical materialize anchor times more
work per query by design; BASELINE.md) — fresh-VM rounds make absolute
totals incomparable (BASELINE.md host note). Run from the repo root:

    python3 tools/r2_anchor.py
"""
import json
import re


def tail_queries(path):
    t = json.load(open(path))["tail"]
    num = r'(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q[^"]+)":' + num, t)}


def main():
    q2 = tail_queries("BENCH_r02.json")
    ref = json.load(open("tools/bench_reference_count_r8.json"))["queries"]
    common = sorted(k for k in q2 if k in ref)
    s2 = sum(q2[k] for k in common)
    s7 = sum(ref[k] for k in common)
    print(f"subset n={len(common)}")
    print(f"r2      = {s2:.1f} s")
    print(f"anchor  = {s7:.1f} s  (tools/bench_reference_count_r8.json)")
    print(f"ratio   = {s7 / s2:.3f}")


if __name__ == "__main__":
    main()
