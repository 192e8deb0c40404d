#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name> subdir of verifyOutDir (parquet written by graft.Verify),
runs oracle_sql.json[<name>] in DuckDB against views over the sfDir parquet
tables, sorts columns by name, sorts rows, and compares values exactly
(floats to 1e-9 relative). Prints one line per query.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return ("f", round(v, 9) if math.isfinite(v) else str(v))
    return (str(type(v).__name__), str(v))


def rows_key(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows])


def close(a, b):
    # Strict: the driver hash-compares, so default to exact equality.
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return "tol"  # truthy, but flags a float-tolerance-only match
        return False
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(quote(c) for c in got_cols)} "
            f"FROM '{out_dir}/{name}/*.parquet'").fetchall()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got_rows)} "
                  f"({'OK' if len(got_rows) > 0 else 'EMPTY!'})")
            continue
        exp = con.sql(oracle[name])
        exp_cols = sorted(exp.columns)
        if exp_cols != got_cols:
            print(f"✗ {name}: SCHEMA mismatch spark={got_cols} duck={exp_cols}")
            n_fail += 1
            continue
        exp_rows = con.sql(
            f"SELECT {', '.join(quote(c) for c in exp_cols)} FROM "
            f"({oracle[name]})").fetchall()
        if len(exp_rows) != len(got_rows):
            print(f"✗ {name}: ROWS {len(got_rows)} vs oracle {len(exp_rows)}")
            n_fail += 1
            continue
        g, e = sorted_rows(got_rows), sorted_rows(exp_rows)
        bad = None
        n_tol = 0
        for i, (gr, er) in enumerate(zip(g, e)):
            if len(gr) != len(er):
                bad = (i, gr, er)
                break
            oks = [close(a, b) for a, b in zip(gr, er)]
            if not all(oks):
                bad = (i, gr, er)
                break
            n_tol += sum(1 for o in oks if o == "tol")
        if bad:
            print(f"✗ {name}: VALUE mismatch at sorted row {bad[0]}:\n"
                  f"    spark={bad[1]}\n    duck ={bad[2]}")
            n_fail += 1
        elif n_tol:
            print(f"~ {name}: {len(got_rows)} rows, {n_tol} values match only "
                  f"within 1e-9 float tolerance — driver hash may still FAIL")
            n_pass += 1
        else:
            print(f"✓ {name}: {len(got_rows)} rows match")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


def quote(c):
    return '"' + c.replace('"', '""') + '"'


def sort_key(r):
    return tuple(
        (1, float(v)) if isinstance(v, (int, float)) and not isinstance(v, bool)
        else (0, str(v)) for v in r)


def sorted_rows(rows):
    return sorted(rows, key=sort_key)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
