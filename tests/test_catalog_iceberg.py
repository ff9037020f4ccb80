"""SnapshotCatalog Iceberg branch, exercised via mock.

The sandbox ships no iceberg-spark-runtime jar and has no network route to
Maven (documented in BASELINE.md), so the probe is always False here; these
tests pin the dispatch contract so the branch is live the moment a jar
appears on the classpath.
"""

from __future__ import annotations

import pytest

from relieff_lsh_spark.sources import catalog as cat


def test_probe_is_false_in_sandbox(spark):
    assert cat._has_iceberg(spark) is False


def test_iceberg_write_dispatch_and_manifest(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(cat, "_has_iceberg", lambda s: True)
    c = cat.SnapshotCatalog(spark, str(tmp_path / "wh"))
    assert c.iceberg

    df = spark.range(5).toDF("x")
    calls = {}

    def fake_write_iceberg(table, d):
        calls["ident"] = c._iceberg_ident(table)
        return d  # stands in for spark.table(ident) over the new snapshot

    monkeypatch.setattr(c, "_write_iceberg", fake_write_iceberg)
    man = c.write("signatures", df, counters={"k": 1})

    assert calls["ident"] == f"{cat.ICEBERG_CATALOG}.wh.signatures"
    assert man["format"] == "iceberg"
    assert man["rows"] == 5
    assert man["counters"] == {"k": 1}


def test_iceberg_read_dispatch(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(cat, "_has_iceberg", lambda s: True)
    c = cat.SnapshotCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(3).toDF("x")
    monkeypatch.setattr(c, "_write_iceberg", lambda table, d: d)
    c.write("components", df)

    seen = {}

    def fake_table(ident):
        seen["ident"] = ident
        return df

    monkeypatch.setattr(spark, "table", fake_table)
    got = c.read("components")
    assert seen["ident"] == c._iceberg_ident("components")
    assert got.count() == 3


def test_parquet_fallback_unchanged(spark, tmp_path):
    c = cat.SnapshotCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(4).toDF("x")
    man = c.write("edges", df)
    assert man["format"] == "parquet-snapshot"
    assert c.exists("edges")
    assert c.read("edges").count() == 4
