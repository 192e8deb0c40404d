#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Canonicalization (empirically pinned against CORRECTNESS_r01.json, see
ADVICE.md): the driver reads the Spark parquet through a pyarrow/pandas
path (DECIMAL columns stay `decimal.Decimal` objects) and the DuckDB
oracle result through DuckDB's pandas conversion (DECIMAL -> float64,
HUGEINT -> float64), then compares str()-canonicalized cells. That is
why Decimal('48131.60') vs 48131.6 hash-mismatched 12/27 round-1
queries whose values were numerically identical. This checker
reproduces exactly that procedure: pandas.read_parquet for the Spark
side, duckdb .df() for the oracle side, str() per cell, sorted columns,
sorted rows, strict equality.

Exit code 1 on any failure, including: a query declared in
oracle_sql.json with no output dir (a crashed Verify query), and a
NO-ORACLE query returning 0 rows.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_rows(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver tiers ship single files; Spark-written tiers (the DR-2
        # sf1eq amplification) are part-file directories
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    names = sorted(dirs | set(oracle))
    n_pass = n_fail = 0
    for name in names:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"✗ {name}: MISSING output (query crashed in Verify?)")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'✓' if ok else '✗'} {name}: NO-ORACLE rows={len(got)}"
                  f"{'' if ok else ' EMPTY!'}")
            n_pass, n_fail = n_pass + ok, n_fail + (not ok)
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL error: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"✗ {name}: SCHEMA spark={sorted(got.columns)} "
                  f"duck={sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"✗ {name}: ROWS {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        g, e = canon_rows(got), canon_rows(exp)
        bad = next((i for i, (gr, er) in enumerate(zip(g, e)) if gr != er),
                   None)
        if bad is not None:
            diff = [(a, b) for a, b in zip(g[bad], e[bad]) if a != b][:3]
            print(f"✗ {name}: VALUE mismatch at sorted row {bad}: {diff}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(got)} rows match")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
