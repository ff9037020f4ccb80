#!/usr/bin/env python
"""NEGATIVE-RESULT A/B probe: per-occurrence JVM token md5
(dedup_docs.token_word_hashes, the shipped form) vs a unique-token-cached
Arrow md5 kernel, on the token-hash substage and on the full shingle stage.

Hypothesis tested: natural-language batches repeat tokens heavily, so
hashing each DISTINCT token once per Arrow batch should beat the JVM's
per-occurrence md5. Measured result (sf0.1 and the 10x sf1x table,
interleaved reps): the substage is a WASH at sf1x (~1.0-1.1s both ways)
and the Arrow form LOSES at sf0.1 (0.45s -> 0.68s) — the stage is bound by
split/transform/struct construction, not by md5 digests, so the cache buys
nothing and the Python hop costs. The JVM expression stays the hot path;
this probe records why (BENCH/tw_kernel_probe.json). The kernel itself is
bit-exact (mismatch count asserted 0 here, including the augmented-docs
clones), so the negative is purely a performance verdict.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python BENCH/tw_kernel_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from relieff_lsh_spark.barrier import barrier  # noqa: E402
from relieff_lsh_spark.operators import dedup_docs as D  # noqa: E402
from relieff_lsh_spark.spread import spread  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "4"))


def token_word_hashes_arrow(col="text"):
    """struct<tw1:array<bigint>, tw2:array<bigint>>: the two md5 words per
    token as PARALLEL arrays — the Arrow twin of token_word_hashes with a
    per-batch unique-token cache. Exactness: Spark's md5 digests the UTF-8
    token bytes and conv(hex, 16, 10) reads 4 bytes big-endian unsigned;
    split(text, ' ') keeps trailing empties (Java limit=-1) exactly like
    str.split(' '), and both sides drop only empty tokens; NULL stays NULL."""
    import hashlib

    @F.pandas_udf("tw1: array<bigint>, tw2: array<bigint>")
    def _tw_kernel(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[int, int]] = {}
        out1: list = []
        out2: list = []
        for t in texts:
            if t is None:
                out1.append(None)
                out2.append(None)
                continue
            toks = [x for x in t.split(" ") if x]
            w1 = np.empty(len(toks), dtype=np.int64)
            w2 = np.empty(len(toks), dtype=np.int64)
            for j, tok in enumerate(toks):
                v = cache.get(tok)
                if v is None:
                    d = hashlib.md5(tok.encode("utf-8")).digest()
                    v = (
                        int.from_bytes(d[:4], "big"),
                        int.from_bytes(d[4:8], "big"),
                    )
                    cache[tok] = v
                w1[j] = v[0]
                w2[j] = v[1]
            out1.append(w1)
            out2.append(w2)
        return pd.DataFrame({"tw1": out1, "tw2": out2})

    return _tw_kernel(F.col(col))


def _horner_arr(twx, i, base, mod):
    acc = F.element_at(twx, i + 1)
    for j in range(1, D.K):
        acc = (acc * base + F.element_at(twx, i + 1 + j)) % mod
    return acc


def _shingles_arr(tw1, tw2):
    n = F.size(tw1)
    sh = F.transform(
        F.sequence(F.lit(0), n - D.K),
        lambda i: F.struct(
            _horner_arr(tw1, i, D.HB1, D.M1).alias("h1"),
            _horner_arr(tw2, i, D.HB2, D.M2).alias("h2"),
        ),
    )
    return F.array_distinct(
        F.when(n >= D.K, sh).otherwise(
            F.array().cast("array<struct<h1:bigint,h2:bigint>>")
        )
    )


def _sh_jvm(docs):
    d0 = barrier(spread(docs).select(
        "doc_id", D.token_word_hashes("text").alias("tw")
    ), eager=False)
    return d0.select(
        "doc_id", D.shingle_hashes_expr(F.col("tw")).alias("sh")
    )


def _sh_arrow(docs):
    d0 = barrier(spread(docs).select(
        "doc_id", token_word_hashes_arrow("text").alias("tws")
    ), eager=False)
    return d0.select(
        "doc_id",
        _shingles_arr(F.col("tws.tw1"), F.col("tws.tw2")).alias("sh"),
    )


def _tw_jvm(docs):
    return spread(docs).select(
        "doc_id", D.token_word_hashes("text").alias("tw")
    )


def _tw_arrow(docs):
    return spread(docs).select(
        "doc_id", token_word_hashes_arrow("text").alias("tws")
    )


def main() -> None:
    from relieff_lsh_spark.session import get_spark

    spark = get_spark(
        app_name="tw-kernel-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = D.augmented_docs(spark.read.parquet(f"{SF_DIR}/documents.parquet"))

    mism = (
        _sh_jvm(docs).alias("a")
        .join(_sh_arrow(docs).alias("b"), "doc_id")
        .where(~F.col("a.sh").eqNullSafe(F.col("b.sh")))
        .count()
    )
    assert mism == 0, f"Arrow kernel diverges from JVM spec on {mism} docs"

    def timed(build):
        t0 = time.time()
        build(docs).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {"probe": "tw_kernel", "sf_dir": SF_DIR, "cpus": CPUS,
           "shingle_mismatch_rows": mism,
           "verdict": "negative — JVM per-occurrence md5 stays the hot path"}
    for label, a_fn, b_fn in [
        ("tw_substage", _tw_jvm, _tw_arrow),
        ("shingle_stage", _sh_jvm, _sh_arrow),
    ]:
        timed(a_fn)  # shared warm-up
        timed(b_fn)
        a_times, b_times = [], []
        for _ in range(REPS):
            a_times.append(timed(a_fn))
            b_times.append(timed(b_fn))
        out[label] = {
            "jvm_sec": a_times, "arrow_sec": b_times,
            "jvm_min": min(a_times), "arrow_min": min(b_times),
            "arrow_over_jvm_min": round(min(b_times) / min(a_times), 3),
        }
    spark.stop()
    line = json.dumps(out)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tw_kernel_probe.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
