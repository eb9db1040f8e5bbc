#!/usr/bin/env python3
"""DuckDB oracle baseline timings: run each oracle SQL N times at a given
scale factor, report median seconds per query as JSON.
Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [reps]
"""
import sys, json, time, statistics

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, reps=3):
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {}
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 4)
    print(json.dumps({"sf": sf_dir, "median_sec": out, "total": round(sum(out.values()), 3)}, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
