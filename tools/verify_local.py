#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (Spark) at a given SF dir, then replays each oracle SQL in
DuckDB over the same parquet tables and compares: schema (column names),
row count, and values (columns sorted by name, rows sorted, exact match with
a tiny float tolerance fallback so we can see *how* far off a mismatch is).

Usage: python3 tools/verify_local.py [sfDir] [--skip-spark]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/testdata/sf0.01"
OUT = Path("/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_spark():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail)
        sys.exit(f"Verify failed rc={r.returncode}")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, sql, con):
    res_dir = OUT / name
    if not res_dir.exists():
        return f"MISSING result dir"
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
    except Exception as e:
        return f"read result failed: {e}"
    try:
        want = con.sql(sql).df()
    except Exception as e:
        return f"oracle SQL failed: {e}"
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return f"schema mismatch: spark={gc} oracle={wc}"
    # The driver hashes values, so an int64-vs-float64 column skew fails
    # there even though Python's == treats 1 and 1.0 as equal. Catch the
    # numeric-kind mismatch locally (object dtype stays lenient).
    for c in gc:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if gk != wk and {gk, wk} <= set("iuf"):
            return (f"dtype mismatch col={c}: spark={got[c].dtype} "
                    f"oracle={want[c].dtype} (hash would differ)")
    if len(got) != len(want):
        return f"rowcount mismatch: spark={len(got)} oracle={len(want)}"
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
    for c in gc:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            a, b = norm(a), norm(b)
            if a == b or (a is None and b is None):
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a == b or (math.isnan(a) and math.isnan(b)):
                    continue
                return (f"value mismatch col={c} row={i}: "
                        f"spark={a!r} oracle={b!r} (diff={a-b:.3e})")
            if str(a) == str(b):
                continue
            return f"value mismatch col={c} row={i}: spark={a!r} oracle={b!r}"
    return None


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    sqls = json.loads((OUT / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    results_on_disk = sorted(p.name for p in OUT.iterdir() if p.is_dir())
    n_pass = n_fail = 0
    for name in results_on_disk:
        if name not in sqls:
            print(f"  ....  {name} (no oracle — rows-only check)")
            continue
        err = compare(name, sqls[name], con)
        if err:
            n_fail += 1
            print(f"  FAIL  {name}: {err}")
        else:
            n_pass += 1
            print(f"  ok    {name}")
    missing = set(sqls) - set(results_on_disk)
    for name in sorted(missing):
        n_fail += 1
        print(f"  FAIL  {name}: no spark result written")
    print(f"{n_pass} ok, {n_fail} fail, "
          f"{len(results_on_disk) - n_pass - n_fail} unoracled")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
