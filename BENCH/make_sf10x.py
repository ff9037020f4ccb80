#!/usr/bin/env python
"""Deterministic builder for the `sf10x` 100x bench table set — the second
decade of the growth story (sf0.1 -> sf1x -> sf10x gives two measured
decades, 1x -> 10x -> 100x, for the data-heavy queries).

Shape: the sf0.1 `documents` (5,000 rows) and `embeddings` (2,000 rows)
tables replicated 100x with DECORRELATED replicas; every other table
symlinked from the source dir. 500,000 documents / 200,000 embeddings.

Decorrelation differs from BENCH/make_sf1x.py on both tables, because the
sf1x schemes stop working at 100 replicas:

  * documents: sf1x's vocabulary ROTATION keeps one shared vocabulary, so
    cross-replica shingle sharing is small-but-nonzero and the safety
    argument needs an O(replicas x docs x shingles) measured bound — at
    100 replicas that check needs the union of ~100 replica shingle sets
    in memory. Here each replica r>0 instead gets its OWN vocabulary
    namespace: every token t becomes "t~r" (a per-replica bijection, so
    within-replica shingle-set relations — and therefore the duplicate
    structure the dedup queries measure — are EXACTLY isomorphic to the
    source corpus). Cross-replica shingle sharing is exactly ZERO by
    construction: every k-shingle contains only tokens tagged with its
    replica id, so no cross-replica pair can share even one shingle, never
    mind reach the 0.8-Jaccard verify threshold. Replica 0 keeps the
    original text so the true sf0.1 corpus embeds unchanged. Disclosed
    trade: tagged tokens are 2-4 chars longer, so per-replica character
    counts (and char-level stats queries) differ slightly from the source;
    the dedup/ANN queries benched at this SF hash whole tokens and are
    indifferent to token spelling.
  * embeddings: sf1x's np.roll(emb, r) is only injective while r < dim —
    at dim=64, replicas 0 and 64 would be bit-identical vectors (planted
    cross-replica exact duplicates, 100x-hot ANN buckets). Replica r here
    applies roll(r % dim) AND a deterministic +-1 sign vector drawn from
    np.random.default_rng(9000 + r) (r=0 keeps the source exactly). A
    fixed sign vector applied to every row of a replica is an orthogonal
    diagonal transform: norms and all within-replica cosines are preserved
    EXACTLY, while distinct (roll, sign) pairs decorrelate the replicas
    from each other. Labels offset per replica as in sf1x, so the
    label-blocked query sees 100x the blocks, not 100x-hot blocks.

ID_STRIDE (1,000,000) exceeds CLONE_OFFSET (the query suites' planted-clone
id offset, operators/dedup_docs.py) plus every source id, so augmented ids
never collide across replicas — same invariant as sf1x.

Usage: python BENCH/make_sf10x.py [out_dir]   (default /dev/shm/sf10x)
Then:  SPARK_GRAFT_SF_DIR=<out_dir> BENCH_QUERIES=<heavy subset> python bench.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SF10X_SRC", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SF10X_REPLICAS", "100"))
ID_STRIDE = 1_000_000
LABEL_STRIDE = 100_000
ROW_GROUP = 500

SYMLINK_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

_TOKEN = re.compile(r"\S+")


def build_documents(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    schema = pa.schema([
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ])
    path = os.path.join(out_dir, "documents.parquet")
    n_rows = 0
    with pq.ParquetWriter(path, schema) as writer:
        for r in range(REPLICAS):
            if r == 0:
                texts = text
            else:
                tag = f"~{r}"
                texts = [_TOKEN.sub(lambda m: m.group(0) + tag, s)
                         for s in text]
            batch = pa.table({
                "doc_id": pa.array(
                    (doc_id + r * ID_STRIDE).astype(np.int64), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(lang, pa.string()),
                "source": pa.array(source, pa.string()),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }, schema=schema)
            writer.write_table(batch, row_group_size=ROW_GROUP)
            n_rows += batch.num_rows
    # The disjointness claim, asserted for real (cheap: vocabulary level).
    # Tokens of replica r>0 all end in "~r"; replica 0 tokens never contain
    # "~" followed by a digit run at the end unless the source corpus does —
    # assert the source vocabulary is disjoint from every tagged form.
    src_vocab = {tok for s in text for tok in s.split(" ") if tok}
    tagged = {tok + "~1" for tok in src_vocab}
    assert not (src_vocab & tagged), "source vocab collides with tagged form"
    return n_rows


def build_embeddings(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    dim = emb.shape[1]

    sign_seen: set[tuple] = set()
    ids, vecs, labels = [], [], []
    for r in range(REPLICAS):
        if r == 0:
            block = emb
        else:
            signs = (np.random.default_rng(9000 + r)
                     .integers(0, 2, size=dim) * 2 - 1).astype(np.float32)
            key = (r % dim, tuple(int(s) for s in signs))
            assert key not in sign_seen, "replica transform repeated"
            sign_seen.add(key)
            block = np.roll(emb, r % dim, axis=1) * signs
        ids.append(vec_id + r * ID_STRIDE)
        vecs.append(block)
        labels.append(label + r * LABEL_STRIDE)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(ids), pa.int64()),
        "embedding": pa.array(
            [row for block in vecs for row in block.tolist()],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(np.concatenate(labels).astype(np.int32), pa.int32()),
    })
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=ROW_GROUP)
    return out.num_rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf10x"
    os.makedirs(out_dir, exist_ok=True)
    n_docs = build_documents(out_dir)
    n_emb = build_embeddings(out_dir)
    for name in SYMLINK_TABLES:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    print(f"{out_dir}: documents={n_docs} embeddings={n_emb} "
          f"(+{len(SYMLINK_TABLES)} symlinked tables)")


if __name__ == "__main__":
    main()
