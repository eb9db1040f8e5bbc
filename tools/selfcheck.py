#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
reads Verify's parquet outputs + oracle_sql.json, runs each oracle in
DuckDB over the same testdata, canonicalizes both sides (columns sorted
by name, rows sorted, doubles rounded to 6dp, timestamps at µs) and
compares hashes. Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import sys, json, math, hashlib, datetime, decimal

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(out).encode()).hexdigest()
    return h, len(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            scols = tbl.column_names
            srows = list(zip(*[tbl.column(c).to_pylist() for c in scols])) if scols else []
            sh, sn = canon(scols, srows)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            # TYPE GATE (r8, root cause of the x54/x58 driver-reds): an
            # oracle whose FINAL projection emits HUGEINT/UHUGEINT (e.g.
            # an uncast sum(BIGINT)) hash-matches under fetchall (Python
            # int) but diverges under any pandas/arrow canon (float64 /
            # Decimal vs Spark's LONG). Fail loud here so it never
            # reaches the driver.
            wide = [f"{c}:{t}" for c, t in
                    zip(con.sql(sql).columns, map(str, con.sql(sql).types))
                    if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
            if wide:
                print(f"FAIL {name}: oracle emits non-portable wide type(s) {wide} "
                      "— CAST the final projection to BIGINT/DOUBLE")
                n_fail += 1
                continue
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            dh, dn = canon(dcols, drows)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            n_fail += 1
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch rows spark={sn} duckdb={dn}")
            # print first differing canonical row for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            a = sorted("|".join(canon_val(r[i]) for i in order_s) for r in srows)
            b = sorted("|".join(canon_val(r[i]) for i in order_d) for r in drows)
            for x, y in zip(a, b):
                if x != y:
                    print(f"  spark : {x[:220]}\n  duckdb: {y[:220]}")
                    break
            if len(a) != len(b):
                only = (set(a) ^ set(b))
                for r in list(only)[:2]:
                    print(f"  only-one-side: {r[:220]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)")
            n_pass += 1
    # rows-only queries (no oracle): check parquet exists and rows > 0
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = pq.read_table(p).num_rows
                print(f"ROWS {d}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS {d}: unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
