#!/usr/bin/env python3
"""Entity-resolution scale corpus with LINEAR true-match volume: TPC-H's
sequential customer names are pathological for edit-distance linkage
(every name sits within lev 2 of thousands of neighbors - 163k true
matches at sf0.1, ~16M at 10x, so ANY complete method's cost is
match-bound and the curve measures the data, not the engine). Here
names are md5-derived 9-hex strings (random-like: cross-record lev <= 2
collisions vanish) and every 10th record gets ONE planted 1-edit twin -
true-match volume = N/10 by construction, so the 10x wall-clock ratio
isolates the candidate-generation machinery.

Usage: python3 tools/make_scale_er.py <outdir> <n_customers>
"""
import hashlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(outdir, n):
    import os
    os.makedirs(outdir, exist_ok=True)
    keys, names, nations = [], [], []
    for k in range(n):
        h = hashlib.md5(str(k).encode()).hexdigest()[:9]
        keys.append(k)
        names.append("Customer#" + h)
        nations.append(k % 25)
        if k % 10 == 0:  # planted 1-edit twin, same nation block
            tw = "Customer#" + ("z" if h[0] != "z" else "y") + h[1:]
            keys.append(n + k)
            names.append(tw)
            nations.append(k % 25)
    t = pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array(names, pa.string()),
        "c_nationkey": pa.array(nations, pa.int32()),
        "c_acctbal": pa.array([0.0] * len(keys), pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * len(keys), pa.string()),
    })
    pq.write_table(t, f"{outdir}/customer.parquet")
    print(f"wrote {t.num_rows} customers ({n} base + {len(keys) - n} twins)")


if __name__ == "__main__":
    # guard: a bare "--help" must never become an output directory
    if len(sys.argv) < 3 or any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        sys.exit(0 if any(a in ("-h", "--help") for a in sys.argv[1:]) else 2)
    main(sys.argv[1], int(sys.argv[2]))
