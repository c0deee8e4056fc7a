#!/usr/bin/env python3
"""Build SCALE.md from three Bench runs (sf0.001/0.01/0.1).

Scaling exponent per query: alpha = log10(t_sf0.1 / t_sf0.01) — data
grows 10x between those SFs, so alpha ~ 0 means fixed-overhead-bound,
alpha ~ 1 means linear in data, alpha > 1 means super-linear (flagged).
sf0.001 is reported for context but not used for the exponent (nearly
every query is overhead-bound there).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        line = f.read().strip()
    # local runs capture sbt's "[info] " prefix; the JSON starts at '{'
    return json.loads(line[line.index("{"):])


def main(f1, f2, f3, out):
    b = {sf: load(p) for sf, p in
         (("0.001", f1), ("0.01", f2), ("0.1", f3))}
    qs = sorted(b["0.01"]["queries"])
    rows = []
    for q in qs:
        t1 = b["0.001"]["queries"].get(q)
        t2 = b["0.01"]["queries"].get(q)
        t3 = b["0.1"]["queries"].get(q)
        if not t2 or not t3 or t2 <= 0 or t3 <= 0:
            continue
        alpha = math.log10(t3 / t2)
        rows.append((q, t1, t2, t3, alpha))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows if r[4] > 1.05 and r[3] > 0.5]
    with open(out, "w") as f:
        f.write("# SCALE — per-query scaling exponents "
                "(sf0.001 / sf0.01 / sf0.1, local[32])\n\n")
        f.write("alpha = log10(t_sf0.1 / t_sf0.01): 0 = overhead-bound, "
                "1 = linear in data, >1 = super-linear.\n")
        f.write("Streaming queries carry ~1-2 s fixed micro-batch/checkpoint "
                "overhead; their alpha understates data scaling.\n\n")
        f.write("Totals: sf0.001 %.1f s, sf0.01 %.1f s, sf0.1 %.1f s "
                "(%d queries)\n\n"
                % (b["0.001"]["value"], b["0.01"]["value"],
                   b["0.1"]["value"], len(rows)))
        if flagged:
            f.write("## FLAGGED super-linear (alpha > 1.05 and >0.5 s at sf0.1)\n\n")
            for q, t1, t2, t3, a in flagged:
                f.write("- **%s**: alpha=%.2f (%.2fs -> %.2fs)\n" % (q, a, t2, t3))
            f.write("\n")
        else:
            f.write("## No query is super-linear "
                    "(alpha > 1.05 with >0.5 s at sf0.1)\n\n")
        f.write("| query | sf0.001 | sf0.01 | sf0.1 | alpha |\n")
        f.write("|---|---|---|---|---|\n")
        for q, t1, t2, t3, a in rows:
            f.write("| %s | %s | %.3f | %.3f | %.2f |\n"
                    % (q, ("%.3f" % t1) if t1 else "—", t2, t3, a))
    print("wrote", out, "flagged:", [r[0] for r in flagged])


if __name__ == "__main__":
    main(*sys.argv[1:5])
