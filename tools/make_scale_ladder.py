#!/usr/bin/env python3
"""LONG-DOCUMENT ladder corpus for x141's scale curve: the r8 bijection
points (avg 54 tokens/doc) sat on the fixed-overhead floor (exponent
0.23 "floor-dominated" per its own BASELINE note), so this instrument
makes the span machinery the dominant cost: every document is
`tokens`-long (default 256 - covers the 8..256 dyadic ladder), token
vocabularies are DISJOINT PER SHARD (the make_scale10 bijection
discipline: cross-shard spans cannot collide, so true-duplicate span
volume scales LINEARLY with the factor), and duplicate spans are
PLANTED at known levels inside each shard:

  - docs (10k, 10k+1) share a 64-token span  -> max_dup_span = 64
  - docs (10k+2, 10k+3) share a 16-token span -> max_dup_span = 16

so the expected output is derivable: per shard, base/10 pairs at level
64 (also matching at 8/16/32 inside it) and base/10 pairs at level 16.
All other tokens are md5-derived uniques - no accidental spans.

Usage: python3 tools/make_scale_ladder.py <outdir> <factor> [base_docs=1000] [tokens=256]
"""
import hashlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def tok(shard, doc, pos):
    return "w%d_%s" % (shard, hashlib.md5(
        ("%d:%d:%d" % (shard, doc, pos)).encode()).hexdigest()[:10])


def main(outdir, factor, base, ntok):
    import os
    os.makedirs(outdir, exist_ok=True)
    ids, texts = [], []
    for s in range(factor):
        docs = [[tok(s, i, j) for j in range(ntok)] for i in range(base)]
        for k in range(0, base - 3, 10):
            docs[k + 1][50:114] = docs[k][50:114]       # 64-token twin span
            docs[k + 3][100:116] = docs[k + 2][100:116]  # 16-token twin span
        for i in range(base):
            ids.append(s * base + i)
            texts.append(" ".join(docs[i]))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["ladder"] * len(ids), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, f"{outdir}/documents.parquet")
    print(f"wrote {t.num_rows} docs x {ntok} tokens ({factor} vocab-disjoint shards)")


if __name__ == "__main__":
    if len(sys.argv) < 3 or any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        sys.exit(0 if any(a in ("-h", "--help") for a in sys.argv[1:]) else 2)
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 1000,
         int(sys.argv[4]) if len(sys.argv) > 4 else 256)
