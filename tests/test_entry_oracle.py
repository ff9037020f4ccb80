"""Replays the driver's correctness gate locally: for every queries() entry
with an oracle, run Spark and DuckDB at sf0.001 and compare row count,
column names, and order-insensitive value hashes."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _value_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

# Data-derived oracles: oracle_sql() generates them for the DRIVER's gate
# tables (sf0.01). This test runs at sf0.001, so regenerate them for its
# tables — the IVF oracle embeds centroids TRAINED on the table's own data
# (round-5), not just constants derived from its row count.
import pyarrow.parquet as pq  # noqa: E402

from relieff_lsh_spark.operators import knn  # noqa: E402

_EMB = f"{SF_DIR}/embeddings.parquet"
_N_EMB = int(pq.ParquetFile(_EMB).metadata.num_rows)
ORACLES["q_ivf_ann_pairs"] = knn.ivf_sql(
    _N_EMB, knn.ivf_sample_parquet(_EMB, _N_EMB)
)
ORACLES["q_simhash_ann_candidates"] = knn.ann_sql(_N_EMB)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert _value_hash(scols, srows) == _value_hash(dcols, drows), (
        f"{name}: value hash mismatch; spark sample={srows[:3]} duck={drows[:3]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["a", "b", "jaccard"]


def test_rows_only_queries_run(spark):
    """The one remaining oracle-less entry: the audio corpus pipeline
    (driver does a rows-only check on it — make sure the exact callable
    the driver invokes works end-to-end)."""
    df = QUERIES["q_audio_dedup_components"](spark, SF_DIR)
    assert df.count() == 500
    assert sorted(df.columns) == ["clip_id", "component_id"]
