#!/usr/bin/env python3
"""Local dev-loop mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, loads the
Spark result parquet from <verifyOutDir>/<name>/, and compares:
  - schema: sorted column-name lists equal
  - rows: row counts equal
  - hash: values compared column-name-sorted, row-sorted; floats are
    BIT-EXACT (repr) — the driver's compare has no float tolerance.
Oracles must avoid result types the driver renders differently from
Spark (HUGEINT/DECIMAL — see BAD_ORACLE_TYPES); violations fail here.
Exit code = number of failing queries.
"""
import glob
import json
import math
import os
import sys
import tempfile

import duckdb

# line-buffer stdout so redirected runs (nohup long big-SF checks)
# show per-query verdicts live instead of one block at exit
sys.stdout.reconfigure(line_buffering=True)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Bit-exact: the driver's compare has no float tolerance, so two
        # doubles must be identical down to the last bit to hash-match.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


# DuckDB result types that the driver's pandas conversion renders
# differently from Spark's parquet output (HUGEINT -> float64 with a
# trailing .0; DECIMAL -> decimal.Decimal with fixed scale). An oracle
# must never produce these: wrap integer sums in CAST(... AS BIGINT)
# and decimal arithmetic in CAST(... AS DOUBLE).
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names (re-check subset)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # big-SF oracles (MinHash CTE chains over 500k+ docs) exceed RAM in
    # a pure in-memory connection, which cannot spill; a per-run temp
    # directory lets DuckDB offload instead of dying with an allocation
    # error (per-run: concurrent checks must not share spill files)
    tmp = tempfile.mkdtemp(prefix="graft_duck_")
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        # driver SF dirs hold single files; GenScale writes Spark-style
        # directories of part files — read_parquet takes either. A
        # GenScale dir generated with a `tables` subset (e.g. only
        # documents+embeddings at big mult) simply lacks the rest —
        # skip those so subset re-checks work; an oracle that actually
        # references a missing table still fails loudly at query time.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    fails = 0
    names = sorted(
        set(oracles) |
        {p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/")})
    if only is not None:
        unknown = only - set(names)
        if unknown:
            # a typo'd subset must not read as an empty (passing) check
            print(f"FATAL: unknown query name(s): {sorted(unknown)}")
            sys.exit(120)
        names = [n for n in names if n in only]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            etypes = [str(t) for t in rel.types]
            ecols = list(rel.columns)
            exp = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        bad = [f"{c}:{t}" for c, t in zip(ecols, etypes)
               if any(b in t for b in BAD_ORACLE_TYPES)]
        if bad:
            print(f"FAIL {name}: oracle column type(s) the driver "
                  f"renders differently from Spark: {bad}")
            fails += 1
            continue
        gc, gt = table(got, gcols)
        ec, et = table(exp, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} vs {ec}")
            fails += 1
        elif len(gt) != len(et):
            print(f"FAIL {name}: rows {len(gt)} vs {len(et)}")
            fails += 1
        elif gt != et:
            diff = next(i for i in range(len(gt)) if gt[i] != et[i])
            print(f"FAIL {name}: values differ, first diff row {diff}:\n"
                  f"  spark: {gt[diff]}\n  duck:  {et[diff]}")
            fails += 1
        else:
            print(f"PASS {name}: {len(gt)} rows")
    print(f"== {len(names) - fails}/{len(names)} pass")
    sys.exit(min(fails, 120))


if __name__ == "__main__":
    main()
