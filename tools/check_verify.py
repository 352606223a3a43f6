#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: check_verify.py <verify_out_dir> <sf_dir> [workers] [threads_per_worker]

For each query dir under <verify_out_dir>: load the Spark-written parquet,
run the matching oracle SQL (from oracle_sql.json) in DuckDB with views over
<sf_dir>/*.parquet, sort columns by name and rows by all columns, and compare
values. Prints one line per query: OK / MISMATCH / NO_ORACLE / ERROR.

Queries run across `workers` processes (default 8) and every completed
result is streamed to <verify_out_dir>/correctness.json in the driver's
CORRECTNESS_r{N}.json shape — a timeout that kills this process mid-sweep
still leaves a valid partial artifact, never an empty one.
"""
import json
import math
import os
import sys
from concurrent.futures import ProcessPoolExecutor

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


def check_one(args):
    """Returns (name, verdict_line, record) — record in the driver's shape."""
    q, out_dir, sf_dir, oracle_sql, threads = args
    import duckdb
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    con = duckdb.connect()
    con.execute(f"set threads={threads}")
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    try:
        got = con.execute(f"select * from '{out_dir}/{q}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        rec["spark_rows"] = len(got_rows)
    except Exception as e:
        rec["err"] = f"reading spark parquet: {e}"
        return q, f"ERROR      {q}: {rec['err']}", rec, True
    if oracle_sql is None:
        rec["err"] = "no oracle"
        return q, f"NO_ORACLE  {q}: rows={len(got_rows)}", rec, False
    try:
        want = con.execute(oracle_sql)
        want_cols = [d[0] for d in want.description]
        want_rows = want.fetchall()
        rec["oracle_rows"] = len(want_rows)
        # the driver's hasher is dtype-sensitive where this str-based
        # compare is not: DuckDB widens integer sum() to HUGEINT, which
        # Spark writes as BIGINT — flag any oracle output column whose
        # type Spark cannot produce (fix: CAST(... AS BIGINT/DOUBLE))
        types = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
        odd = [(c[0], c[1]) for c in types
               if c[1] in ("HUGEINT", "UHUGEINT") or c[1].startswith("DECIMAL")]
        if odd:
            rec["err"] = f"oracle type Spark can't produce: {odd}"
            return q, f"MISMATCH   {q}: {rec['err']}", rec, True
    except Exception as e:
        rec["err"] = f"oracle sql failed: {e}"
        return q, f"ERROR      {q}: {rec['err']}", rec, True
    if sorted(got_cols) != sorted(want_cols):
        rec["err"] = (f"columns spark={sorted(got_cols)} "
                      f"oracle={sorted(want_cols)}")
        return q, f"MISMATCH   {q}: {rec['err']}", rec, True
    rec["schema_match"] = True
    gk, wk = frame_key(got_rows, got_cols), frame_key(want_rows, want_cols)
    rec["rows_match"] = len(gk) == len(wk)
    if not rec["rows_match"]:
        rec["err"] = f"rowcount spark={len(gk)} oracle={len(wk)}"
        return q, f"MISMATCH   {q}: {rec['err']}", rec, True
    if gk != wk:
        diffs = [i for i, (a, b) in enumerate(zip(gk, wk)) if a != b]
        i = diffs[0]
        rec["err"] = f"{len(diffs)} differing rows"
        line = (f"MISMATCH   {q}: {len(diffs)} differing rows; first at "
                f"sorted-index {i}:\n  spark : {gk[i]}\n  oracle: {wk[i]}")
        return q, line, rec, True
    rec["hash_match"] = True
    return q, f"OK         {q}: rows={len(gk)}", rec, False


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    jobs = [(q, out_dir, sf_dir, oracle.get(q), threads) for q in qdirs]
    results = {}
    n_ok = n_bad = 0
    art_path = f"{out_dir}/correctness.json"

    def flush():
        tmp = art_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        os.replace(tmp, art_path)

    with ProcessPoolExecutor(max_workers=workers) as ex:
        for q, line, rec, bad in ex.map(check_one, jobs):
            results[q] = rec
            print(line, flush=True)
            if bad:
                n_bad += 1
            elif rec["hash_match"]:
                n_ok += 1
            flush()
    print(f"== {n_ok} ok, {n_bad} bad, {len(qdirs)} total ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
