#!/usr/bin/env python3
"""Time every oracle SQL arm in DuckDB (serial per worker, parallel across
workers) and print a ranking. Usage: time_oracles.py <oracle_sql.json> <sf_dir>
[threads_per_conn] [workers]"""
import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_one(args):
    name, sql, sf_dir, threads = args
    import duckdb
    con = duckdb.connect()
    con.execute(f"set threads={threads}")
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        return name, time.time() - t0, None
    except Exception as e:
        return name, time.time() - t0, str(e)[:120]


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    oracle = json.load(open(oracle_path))
    jobs = [(k, v, sf_dir, threads) for k, v in sorted(oracle.items())]
    results = []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for name, dt, err in ex.map(run_one, jobs):
            results.append((dt, name, err))
    results.sort(reverse=True)
    total = sum(r[0] for r in results)
    for dt, name, err in results[:40]:
        flag = f" ERR {err}" if err else ""
        print(f"{dt:8.2f}s  {name}{flag}")
    print(f"== total serial-equivalent: {total:.1f}s over {len(results)} arms ==")


if __name__ == "__main__":
    main()
