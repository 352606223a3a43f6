#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: check_verify.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark-written parquet,
run the matching oracle SQL (from oracle_sql.json) in DuckDB with views over
<sf_dir>/*.parquet, sort columns by name and rows by all columns, and compare
values. Prints one line per query: OK / MISMATCH / NO_ORACLE / ERROR.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_ok = n_bad = 0
    for q in qdirs:
        try:
            got = con.execute(
                f"select * from '{out_dir}/{q}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"ERROR      {q}: reading spark parquet: {e}")
            n_bad += 1
            continue
        if q not in oracle:
            print(f"NO_ORACLE  {q}: rows={len(got_rows)}")
            continue
        try:
            want = con.execute(oracle[q])
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
            # the driver's hasher is dtype-sensitive where this str-based
            # compare is not: DuckDB widens integer sum() to HUGEINT, which
            # Spark writes as BIGINT — flag any oracle output column whose
            # type Spark cannot produce (fix: CAST(... AS BIGINT/DOUBLE))
            types = con.execute(f"DESCRIBE {oracle[q]}").fetchall()
            odd = [(c[0], c[1]) for c in types
                   if c[1] in ("HUGEINT", "UHUGEINT")
                   or c[1].startswith("DECIMAL")]
            if odd:
                print(f"MISMATCH   {q}: oracle output type Spark can't "
                      f"produce (driver hash will differ): {odd}")
                n_bad += 1
                continue
        except Exception as e:
            print(f"ERROR      {q}: oracle sql failed: {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"MISMATCH   {q}: columns spark={sorted(got_cols)} "
                  f"oracle={sorted(want_cols)}")
            n_bad += 1
            continue
        gk, wk = frame_key(got_rows, got_cols), frame_key(want_rows, want_cols)
        if len(gk) != len(wk):
            print(f"MISMATCH   {q}: rowcount spark={len(gk)} oracle={len(wk)}")
            n_bad += 1
            continue
        if gk != wk:
            diffs = [i for i, (a, b) in enumerate(zip(gk, wk)) if a != b]
            i = diffs[0]
            print(f"MISMATCH   {q}: {len(diffs)} differing rows; first at "
                  f"sorted-index {i}:\n  spark : {gk[i]}\n  oracle: {wk[i]}")
            n_bad += 1
            continue
        print(f"OK         {q}: rows={len(gk)}")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {len(qdirs)} total ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
