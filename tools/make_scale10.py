#!/usr/bin/env python3
"""Deterministic 10x scale corpus for the r7 scale-curve evidence run
(BASELINE.md): ten VOCABULARY-DISJOINT shards, each a token-bijection
image of sf0.1's documents, plus ten dimension-rotated copies of the
embeddings (rotation is an isometry, so per-shard cosines are exactly
preserved).

The bijection maps each token to a SAME-LENGTH md5-derived pseudo-token
keyed by (shard, token). Why this and not cloning-with-noise or a
prefix letter:
  - a token bijection preserves each shard's ENTIRE shingle/Jaccard/dup
    structure exactly while making cross-shard token overlap zero —
    total candidate-pair volume for the token-set dedup family
    (x2/x93/x17) scales linearly BY CONSTRUCTION;
  - same-length substitution keeps n_chars and the byte-length layout,
    and SCRAMBLES the raw bytes per shard — the multimodal queries
    (x94/x95) synthesize rasters from text bytes, and a prefix-letter
    scheme left shard rasters near-identical (measured: 253x cross-shard
    aHash collisions) where the hash bijection keeps image near-dup
    families per-shard;
  - naive cloning makes every clone a near-dup of its 9 siblings and
    inflates pair volume ~45x — a data artifact, not engine scaling.

Usage: python3 tools/make_scale10.py [outdir=/tmp/scale10] [factor=10]
(factor = number of vocabulary-disjoint shards; 10 and 100 are the
round-7 evidence points)
"""
import hashlib
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def remap(token, k, cache):
    key = (k, token)
    t = cache.get(key)
    if t is None:
        h = hashlib.md5(f"{k}:{token}".encode()).digest()
        # same length, letters only — deterministic per (shard, token)
        t = "".join(ALPHA[h[i % 16] * (i // 16 + 1) % 26] for i in range(len(token)))
        cache[key] = t
    return t


def main(out, factor=10):
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
    rows, cache = [], {}
    for k in range(factor):
        for d in docs:
            text = " ".join(remap(t, k, cache) for t in d["text"].split(" "))
            rows.append({"doc_id": d["doc_id"] + k * 100000, "text": text,
                         "lang": d["lang"], "source": d["source"],
                         "n_chars": len(text)})
    pq.write_table(pa.Table.from_pylist(rows), f"{out}/documents.parquet")
    print("documents:", len(rows))

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pylist()
    rows = []
    for k in range(factor):
        r = (8 * k) % 64  # distinct rotations cycle; vec_id offsets keep shards disjoint
        for e in emb:
            v = e["embedding"]
            rows.append({"vec_id": e["vec_id"] + k * 100000,
                         "embedding": v[r:] + v[:r], "label": e["label"]})
    t = pa.Table.from_pylist(rows, schema=pq.read_schema(f"{SRC}/embeddings.parquet"))
    pq.write_table(t, f"{out}/embeddings.parquet")
    print("embeddings:", len(rows))

    for name in "region nation customer supplier part orders lineitem events".split():
        shutil.copy(f"{SRC}/{name}.parquet", f"{out}/{name}.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
