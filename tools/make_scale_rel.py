#!/usr/bin/env python3
"""Deterministic Nx scale corpus for the RELATIONAL tables (r7b scale-
curve evidence, the lineitem/orders analog of make_scale10.py's document
shards): N key-disjoint shards, each an exact copy of sf0.1 with every
join key shifted by shard*(max_key+1).

Why key-shifting and not row cloning: shifting keeps every shard's join
fan-out, order composition, and pairwise-comparison structure EXACTLY
equal to sf0.1's while making cross-shard key overlap zero — so
x123's comparison volume, x125's frequency tables, and q42's per-week
manifest all scale linearly BY CONSTRUCTION, and the measured wall-clock
ratio is the engine's, not a data artifact. (Cloning without shifting
would multiply per-key frequencies instead, quadratically inflating
x123's per-pair counts and x125's true join sizes.)

Dates are left untouched: q42's week domain deliberately stays constant
(the planner's output is metadata-sized; only its corpus aggregation
should scale).

Usage: python3 tools/make_scale_rel.py [outdir=/tmp/scale_rel] [factor=10]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out: str, n: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "part", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")
    ok, ck, pk, sk, ek, uk = [
        con.execute(q).fetchone()[0] + 1
        for q in (
            "SELECT max(o_orderkey) FROM orders",
            "SELECT max(c_custkey) FROM customer",
            "SELECT max(p_partkey) FROM part",
            "SELECT max(l_suppkey) FROM lineitem",
            "SELECT max(event_id) FROM events",
            "SELECT max(user_id) FROM events",
        )
    ]
    shards = f"(SELECT unnest(range({n})) AS sh)"
    jobs = {
        "lineitem": f"""SELECT l_orderkey + sh*{ok} AS l_orderkey,
            l_partkey + sh*{pk} AS l_partkey, l_suppkey + sh*{sk} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate
          FROM lineitem, {shards}""",
        "orders": f"""SELECT o_orderkey + sh*{ok} AS o_orderkey,
            o_custkey + sh*{ck} AS o_custkey, * EXCLUDE (o_orderkey, o_custkey, sh)
          FROM orders, {shards}""",
        "customer": f"""SELECT c_custkey + sh*{ck} AS c_custkey,
            * EXCLUDE (c_custkey, sh) FROM customer, {shards}""",
        "part": f"""SELECT p_partkey + sh*{pk} AS p_partkey,
            * EXCLUDE (p_partkey, sh) FROM part, {shards}""",
        # per-user event streams (as-of joins, sessionization, RFM):
        # user_id shifts per shard so per-key stream shapes are exactly
        # sf0.1's; ts untouched (the time domain deliberately constant)
        "events": f"""SELECT event_id + sh*{ek} AS event_id,
            user_id + sh*{uk} AS user_id, * EXCLUDE (event_id, user_id, sh)
          FROM events, {shards}""",
    }
    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        rows = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        base = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert rows == n * base, (t, rows, base)
        print(f"{t}: {rows} rows ({n}x{base})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rel"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, n)
