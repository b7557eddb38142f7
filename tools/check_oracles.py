#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Runs graft.Verify at the given sf dir (Spark dumps each query to parquet +
oracle_sql.json), then executes each oracle SQL in DuckDB with the sfDir
tables registered by bare name, and compares value-sets column-name-wise.

Usage: python3 tools/check_oracles.py [sfDir] [outDir]
"""
import json
import math
import sys
import glob
import os
import subprocess

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"


def run_verify():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        check=True, env=env, capture_output=True, text=True)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def table_of(rel):
    cols = [c.lower() for c in rel.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for f in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok, bad = 0, []
    for name, sql in sorted(oracle.items()):
        got_dir = f"{OUT}/{name}"
        try:
            gcols, got = table_of(con.sql(
                f"SELECT * FROM read_parquet('{got_dir}/*.parquet')"))
            wcols, want = table_of(con.sql(sql))
        except Exception as e:
            bad.append((name, f"EXEC {e}"))
            continue
        if gcols != wcols:
            bad.append((name, f"SCHEMA got={gcols} want={wcols}"))
        elif got != want:
            diff_g = [r for r in got if r not in want][:3]
            diff_w = [r for r in want if r not in got][:3]
            bad.append((name, f"VALUES rows {len(got)} vs {len(want)}; "
                              f"got-only={diff_g} want-only={diff_w}"))
        else:
            ok += 1
            print(f"  OK   {name} ({len(got)} rows)")
    for name, msg in bad:
        print(f"  FAIL {name}: {msg}")
    print(f"{ok}/{len(oracle)} oracle queries match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
