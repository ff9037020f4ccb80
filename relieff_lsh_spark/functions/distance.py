"""Pairwise verification distances — all JVM-side column expressions.

The reference's DistanceProvider (ReliefFFeatureSelector.scala:29-52) is a
per-pair scalar closure; here each metric is a codegen'd expression so the
verify stage stays inside whole-stage codegen (SURVEY.md §4 O11). The one
exception is cosine_seqfold — an Arrow kernel that is a measured,
bit-identical replacement for the interpreted HOF cosine fold (its
docstring has the equivalence argument).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_seqfold(a: Column, b: Column) -> Column:
    """BIT-IDENTICAL Arrow twin of the HOF left-fold cosine used by the
    pair-verify queries (knn._cos): higher-order-function lambdas are
    interpreted per ELEMENT (CodegenFallback), so at 64 dims each verified
    pair paid ~200 interpreted evals — the dominant cost of the
    cosine-verify queries once candidates number in the millions. The
    kernel below replaces the per-element interpreter with one vectorized
    numpy op per dimension per Arrow batch while preserving the exact IEEE
    value, term by term:

      * accumulation runs dim-by-dim ACROSS the batch (``acc += A[:,i] *
        B[:,i]``) — the same left-fold order as ``aggregate(zip_with(a, b,
        x*y), 0.0, acc+v)``, starting from the same +0.0, so every
        intermediate rounding is the JVM fold's rounding;
      * each step is one IEEE-754 double mul then one add — numpy ufuncs
        do not fuse (no FMA contraction), matching the JVM's strict
        non-fused double semantics;
      * sqrt/division/multiplication are single correctly-rounded IEEE ops
        in both runtimes, applied in the same expression order
        ``dot / (sqrt(na2) * sqrt(nb2))``.

    The result column is the UNROUNDED double, identical to the HOF form
    bit for bit (pinned by tests/test_ann.py::test_cosine_seqfold_bitexact);
    callers apply the same F.round(_, 6) they applied before. No
    zero-norm guard, exactly like knn._cos (0/0 -> NaN either way).
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _cos_kernel(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        n = len(A)
        dot = np.zeros(n)
        na2 = np.zeros(n)
        nb2 = np.zeros(n)
        for i in range(A.shape[1]):
            ai = A[:, i]
            bi = B[:, i]
            dot += ai * bi
            na2 += ai * ai
            nb2 += bi * bi
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dot / (np.sqrt(na2) * np.sqrt(nb2))
        return pd.Series(out)

    return _cos_kernel(a, b)


def intersect_count_u64pairs(a1: Column, a2: Column,
                             b1: Column, b2: Column) -> Column:
    """Exact count of common (h1, h2) pairs between two pair-distinct
    shingle-hash sets carried as PARALLEL array<bigint> columns — the Arrow
    replacement for ``size(array_intersect(sh_a, sh_b))`` over
    array<struct<h1,h2>>: ArrayIntersect has a hash fast path only for
    primitive element types; struct elements fall back to O(n*m)
    ordering-based comparison, which made the exact-Jaccard tail the most
    expensive stage of the document verify query (measured 4-7x tail
    speedup at sf1x, BENCH/jv_profile.py; the whole-query A/B is in
    BENCH/cos_kernel_probe.json's sibling artifacts).

    Exactness: both h1 and h2 are < 2^32 (Horner chains mod ~2^32 primes),
    so each pair packs LOSSLESSLY into one uint64 key (h1 << 32 | h2); the
    result is an integer count — no floating point anywhere, so the DuckDB
    oracle needs no change. assume_unique holds because the shingle arrays
    are array_distinct upstream (pair-distinct => packed-key-distinct).
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def _nint(s_a1: pd.Series, s_a2: pd.Series,
              s_b1: pd.Series, s_b2: pd.Series) -> pd.Series:
        out = np.empty(len(s_a1), dtype=np.int32)
        u32 = np.uint64(32)
        for i in range(len(s_a1)):
            ka = (s_a1[i].astype(np.uint64) << u32) | s_a2[i].astype(np.uint64)
            kb = (s_b1[i].astype(np.uint64) << u32) | s_b2[i].astype(np.uint64)
            out[i] = np.intersect1d(ka, kb, assume_unique=True).size
        return pd.Series(out)

    return _nint(a1, a2, b1, b2)
