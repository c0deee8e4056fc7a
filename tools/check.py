#!/usr/bin/env python3
"""Local dev-loop mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [onlyCsvNames]

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

GRAFT_CHECK_JOBS=N parallelizes ACROSS queries with a process pool
(each worker opens its own DuckDB connection + spill dir). The
per-query verdict logic is byte-identical to the serial path; big-SF
full-registry runs are Python-normalization-bound (repr per value,
single-core), so the pool is the wall-clock lever. Default 1.
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


def connect(sf_dir):
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
    return con


def check_one(sf_dir, out_dir, name, oracle, con=None):
    """Verdict for one query: (passed, message). Identical logic in the
    serial and pooled paths."""
    if con is None:
        con = connect(sf_dir)
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return False, f"FAIL {name}: no spark output"
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchall()
    gcols = [d[0] for d in con.description]
    if oracle is None:
        return True, f"ROWS {name}: {len(got)} rows (no oracle)"
    try:
        rel = con.sql(oracle)
        etypes = [str(t) for t in rel.types]
        ecols = list(rel.columns)
        exp = rel.fetchall()
    except Exception as e:
        return False, f"FAIL {name}: oracle error: {e}"
    bad = [f"{c}:{t}" for c, t in zip(ecols, etypes)
           if any(b in t for b in BAD_ORACLE_TYPES)]
    if bad:
        return False, (f"FAIL {name}: oracle column type(s) the driver "
                       f"renders differently from Spark: {bad}")
    gc, gt = table(got, gcols)
    ec, et = table(exp, ecols)
    if gc != ec:
        return False, f"FAIL {name}: schema {gc} vs {ec}"
    if len(gt) != len(et):
        return False, f"FAIL {name}: rows {len(gt)} vs {len(et)}"
    if gt != et:
        diff = next(i for i in range(len(gt)) if gt[i] != et[i])
        return False, (f"FAIL {name}: values differ, first diff row "
                       f"{diff}:\n  spark: {gt[diff]}\n  duck:  {et[diff]}")
    return True, f"PASS {name}: {len(gt)} rows"


def _pool_task(args):
    sf_dir, out_dir, name, oracle = args
    try:
        return check_one(sf_dir, out_dir, name, oracle)
    except Exception as e:  # a worker crash must read as that query failing
        return False, f"FAIL {name}: worker error: {e}"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names (re-check subset)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    jobs = int(os.environ.get("GRAFT_CHECK_JOBS", "1"))
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
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
    fails = 0
    if jobs > 1:
        # ProcessPoolExecutor, not mp.Pool: an OOM-killed worker (giant
        # python compares can hit tens of GB) makes Pool.imap hang
        # FOREVER on the lost task; the executor raises
        # BrokenProcessPool instead, and per-future bookkeeping lets
        # the dead query fail loudly while the rest still report.
        from concurrent.futures import ProcessPoolExecutor, wait
        from concurrent.futures import FIRST_COMPLETED
        pending = {}
        with ProcessPoolExecutor(jobs) as pool:
            for n in names:
                pending[pool.submit(_pool_task,
                    (sf_dir, out_dir, n, oracles.get(n)))] = n
            while pending:
                done, _ = wait(pending, return_when=FIRST_COMPLETED)
                for fut in done:
                    n = pending.pop(fut)
                    try:
                        ok, msg = fut.result()
                    except Exception as e:
                        ok, msg = False, (f"FAIL {n}: worker died "
                                          f"({type(e).__name__}: {e}) — "
                                          f"rerun serially")
                    print(msg)
                    if not ok:
                        fails += 1
    else:
        con = connect(sf_dir)
        for name in names:
            ok, msg = check_one(sf_dir, out_dir, name,
                                oracles.get(name), con)
            print(msg)
            if not ok:
                fails += 1
    print(f"== {len(names) - fails}/{len(names)} pass")
    sys.exit(min(fails, 99))


if __name__ == "__main__":
    main()
