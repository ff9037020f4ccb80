"""Pairwise verification distances — all JVM-side column expressions.

The reference's DistanceProvider (ReliefFFeatureSelector.scala:29-52) is a
per-pair scalar closure; here each metric is a codegen'd expression so the
verify stage stays inside whole-stage codegen (SURVEY.md §4 O11).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHash signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def jaccard_sets(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array<bigint> shingle-hash sets (arrays must be
    distinct-element). Empty-vs-empty -> 0.0 (the zero-range guard pattern,
    reference R:42-45)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def minhash_agree(a: Column, b: Column) -> Column:
    """Number of agreeing MinHash lanes between two equal-length
    array<bigint> signatures (the MinHash Jaccard estimate is this divided
    by the signature length). JVM-side fold; NULL if either side is NULL."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def contains_verbatim(needle: Column, haystack: Column) -> Column:
    """Word-boundary verbatim containment of one transcript in another."""
    pad_n = F.concat(F.lit(" "), F.trim(needle), F.lit(" "))
    pad_h = F.concat(F.lit(" "), F.trim(haystack), F.lit(" "))
    return (F.length(F.trim(needle)) > 0) & F.contains(pad_h, pad_n)


def substr_either(t_a: Column, t_b: Column) -> Column:
    return contains_verbatim(t_a, t_b) | contains_verbatim(t_b, t_a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> embeddings, via
    aggregate/zip_with (JVM-side; no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
