#!/usr/bin/env python3
"""Deterministic REPLICATED scale corpus for frequency-flavored scale
curves (qs25 heavy hitters, x57 Misra-Gries, anything whose output
depends on token/corpus SHARES): `factor` copies of sf0.1's documents
with doc_id shifted per shard and text UNCHANGED, so every token's
corpus share is exactly preserved while the stream/scan volume scales
by `factor`.

This is the complement of make_scale10.py's vocabulary-disjoint
bijection: the bijection preserves per-shard pair structure (right for
dedup, where cloning would inflate pair volume ~45x) but dilutes every
global frequency share by 1/factor - at 10x it pushed every qs25 heavy
hitter below threshold and the curve measured an empty result, not the
engine. Share-preserving replication is the right instrument for the
frequency family; pair-counting queries must NOT be benched on it.

Usage: python3 tools/make_scale_rep.py [outdir=/tmp/scale10_rep] [factor=10]
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(outdir, factor):
    import os
    os.makedirs(outdir, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    doc_id = t.column("doc_id").to_pylist()
    shift = max(doc_id) + 1
    shards = []
    for k in range(factor):
        cols = {}
        for name in t.column_names:
            if name == "doc_id":
                cols[name] = pa.array([d + k * shift for d in doc_id],
                                      type=t.schema.field(name).type)
            else:
                cols[name] = t.column(name)
        shards.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(shards)
    pq.write_table(out, f"{outdir}/documents.parquet")
    print(f"wrote {out.num_rows} rows ({factor} share-preserving shards of {n})")


if __name__ == "__main__":
    # guard: a bare "--help" must never become an output directory
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        sys.exit(0)
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10_rep"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(outdir, factor)
