#!/usr/bin/env python
"""Deterministic builder for the `sf1x` 10x bench table set (BENCH/BASELINE.md
"Round-4 query-suite bench" section) — committed so the 10x point is
reproducible (the table set itself lives in tmpfs and dies with the host).

Shape: the sf0.1 `documents` and `embeddings` tables replicated 10x with
DECORRELATED replicas; every other table symlinked from the source dir.
Decorrelation matters because naive replication would plant a 10-way exact
duplicate of every row — the dedup queries would measure a pathological
corpus (every band bucket 10x hot) instead of 10x the volume:

  * documents, replica r: doc_id += r * ID_STRIDE and every TOKEN is mapped
    through a vocabulary rotation (sorted distinct corpus tokens, index
    shifted by r * VOCAB_STEP mod |V|). Within a replica the duplicate
    structure of the original corpus is preserved EXACTLY (token mapping is
    a bijection, so shingle-set relations are isomorphic); across replicas
    shingle sharing is SMALL but not zero — the round-4 docstring claimed
    zero on the strength of a shift-has-no-fixed-point assert, and the
    round-4 ADVICE was right to call that vacuous: an explicit intersection
    check (below) MEASURES ~0.8% of a replica's shingles shared with each
    other replica (~7.2% cumulative at replica 9 — repeated-token windows
    whose indices differ by exactly the inter-replica delta). What actually
    protects the bench corpus's duplicate structure is the per-document
    bound, asserted for real after building: no document has more than 50%
    of its shingles present in other replicas (measured max exactly 0.50),
    so no cross-replica pair can reach the 0.8-Jaccard verify threshold —
    cross-replica rows make stray band CANDIDATES only, never verified
    duplicates.
  * embeddings, replica r: vec_id += r * ID_STRIDE, embedding components
    rotated by r positions (np.roll), label += r * LABEL_STRIDE. Rotation
    preserves norms and within-replica cosines exactly; labels are offset so
    the label-blocked near-dup query sees 10x the BLOCKS, not 10x-hot
    blocks.

ID_STRIDE exceeds CLONE_OFFSET (the query suites' planted-clone id offset,
operators/dedup_docs.py) plus every source id, so augmented ids never
collide across replicas.

Usage: python BENCH/make_sf1x.py [out_dir]   (default /dev/shm/sf1x)
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SF1X_SRC", "/root/testdata/sf0.1")
REPLICAS = 10
ID_STRIDE = 1_000_000
LABEL_STRIDE = 100_000
VOCAB_STEP = 7919  # shift per replica; r*VOCAB_STEP % |V| != 0 asserted
ROW_GROUP = 500  # scan parallelism floor = row groups per file

SYMLINK_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]


def build_documents(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    token_lists = [s.split(" ") for s in text]
    vocab = sorted({tok for toks in token_lists for tok in toks if tok})
    v = len(vocab)
    index = {tok: i for i, tok in enumerate(vocab)}
    for r in range(1, REPLICAS):
        assert (r * VOCAB_STEP) % v != 0, "replica shift has a fixed point"

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    K = 5  # dedup_docs.K — the shingle width the disjointness claim is about
    JACCARD_MIN = 0.8  # dedup_docs verify threshold the bound must clear
    rep_sets: list[set] = []       # per-replica shingle-hash sets
    doc_sets: list[list[set]] = []  # per-replica per-doc shingle-hash sets
    for r in range(REPLICAS):
        shift = (r * VOCAB_STEP) % v
        replica_shingles: set = set()
        replica_docs: list[set] = []
        for i, toks in enumerate(token_lists):
            if shift == 0:
                s = text[i]
            else:
                s = " ".join(
                    vocab[(index[tok] + shift) % v] if tok else tok
                    for tok in toks
                )
            ids.append(int(doc_id[i]) + r * ID_STRIDE)
            texts.append(s)
            langs.append(lang[i])
            sources.append(source[i])
            n_chars.append(len(s))
            words = [w for w in s.split(" ") if w]
            sh = {
                hash(tuple(words[j:j + K])) for j in range(len(words) - K + 1)
            }
            replica_docs.append(sh)
            replica_shingles |= sh
        seen = set().union(*rep_sets) if rep_sets else set()
        overlap = replica_shingles & seen
        if overlap:
            print(f"  replica {r}: {len(overlap)} shingles shared with "
                  f"earlier replicas ({len(overlap) / len(replica_shingles):.2%})"
                  " — candidates-only noise, bounded below")
        rep_sets.append(replica_shingles)
        doc_sets.append(replica_docs)
    # The check that protects the bench claim (docstring): no document can
    # verify against ANY cross-replica document, because cross-replica
    # Jaccard is bounded by the fraction of the doc's shingles present in
    # other replicas at all — assert that stays under the verify threshold.
    worst = 0.0
    for r in range(REPLICAS):
        other = set().union(*(rep_sets[s] for s in range(REPLICAS) if s != r))
        for sh in doc_sets[r]:
            if sh:
                worst = max(worst, len(sh & other) / len(sh))
    print(f"  max per-doc cross-replica shingle fraction: {worst:.3f} "
          f"(verify threshold {JACCARD_MIN})")
    assert worst < JACCARD_MIN, (
        f"a document shares {worst:.2%} of its shingles across replicas — "
        "cross-replica pairs could verify; duplicate structure broken"
    )
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=ROW_GROUP)
    return out.num_rows


def build_embeddings(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()

    ids, vecs, labels = [], [], []
    for r in range(REPLICAS):
        ids.append(vec_id + r * ID_STRIDE)
        vecs.append(np.roll(emb, r, axis=1))
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
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1x"
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
