"""Snapshot catalog: versioned, resumable table checkpoints + lineage.

The north_rule requires Iceberg-snapshot checkpointing with per-partition
lineage and counters. When an Iceberg runtime jar is on the classpath the
catalog uses `writeTo(...).createOrReplace()`; in this sandbox no Iceberg
jar ships with pyspark, so the catalog falls back to the functionally
equivalent versioned-parquet layout FIXTURES.md §5 specifies:

    <warehouse>/<table>/v=N/*.parquet      (immutable snapshot data)
    <warehouse>/<table>/manifest.json      (atomic pointer: latest version,
                                            row count, per-partition lineage,
                                            stage counters, config hash)

Manifest writes are tmp-file + os.replace (atomic on POSIX), so a killed job
never leaves a half-registered snapshot — the resume contract the reference
gets from its `read` method + graph files (ReliefFFeatureSelector.scala:262,
336)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_iceberg(spark: SparkSession) -> bool:
    """Probe for an Iceberg runtime on the classpath.

    Sandbox status (round 2, documented in BASELINE.md): no
    iceberg-spark-runtime jar ships in /opt/spark/jars or anywhere on the
    image, and the sandbox has no network route to Maven
    (repo1.maven.org does not resolve), so the probe is always False here
    and the versioned-parquet fallback carries the snapshot semantics.
    The Iceberg branch below is real code, exercised via mock in
    tests/test_catalog_iceberg.py."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


ICEBERG_CATALOG = "lshcat"  # spark.sql.catalog.lshcat = SparkCatalog (hadoop)


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts of a (materialized) DataFrame (one Spark
    job). Used for the Iceberg branch; the parquet-snapshot branch derives
    lineage from file footers instead (file_lineage — zero Spark jobs)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": int(r["partition_id"]), "rows": int(r["rows"])} for r in rows]


def file_lineage(data_dir: str) -> list[dict]:
    """Per-partition (per output file) row counts read from the parquet
    footers on the DRIVER — no Spark job. Each writer task produces one
    part file, so footer counts ARE the per-partition lineage; at real scale
    this is exactly the metadata a table format keeps in its manifests
    (round-3 change: the per-stage lineage groupBy job this replaces was
    pure fixed per-run latency at high parallelism)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    # filter BEFORE enumerating: skipped entries (_SUCCESS, .crc) must not
    # consume partition_id values — ids are 0-based and contiguous, matching
    # partition_lineage's semantics
    names = sorted(n for n in os.listdir(data_dir) if n.endswith(".parquet"))

    def _rows(name: str) -> int:
        return int(pq.ParquetFile(os.path.join(data_dir, name)).metadata.num_rows)

    # footer reads are tiny random IO: serial, a 368-file snapshot cost ~3.5s
    # of driver-only wall PER STAGE (event-log profile) — a fixed cost the
    # scaling gate's 4N leg pays at 4x relative weight. 16 threads make it
    # ~0.3s; ordering (and therefore partition_id assignment) is preserved.
    with ThreadPoolExecutor(max_workers=16) as ex:
        counts = list(ex.map(_rows, names))
    return [
        {"partition_id": i, "rows": n, "file": name}
        for i, (name, n) in enumerate(zip(names, counts))
    ]


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self.iceberg = _has_iceberg(spark)

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "manifest.json")

    def manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self, table: str) -> bool:
        m = self.manifest(table)
        if m is None:
            return False
        if m.get("format") == "iceberg":
            return self.spark.catalog.tableExists(self._iceberg_ident(table))
        return os.path.isdir(
            os.path.join(self.warehouse, table, f"v={m['version']}")
        )

    # -- write / read -------------------------------------------------------
    def _iceberg_ident(self, table: str) -> str:
        ns = os.path.basename(self.warehouse.rstrip("/")).replace("-", "_") or "wh"
        return f"{ICEBERG_CATALOG}.{ns}.{table}"

    def _write_iceberg(self, table: str, df: DataFrame) -> DataFrame:
        """Iceberg snapshot write: createOrReplace is a new snapshot of the
        table (atomic metadata-pointer swap — the manifest.json analog is
        native here); time travel and concurrent writers come with the
        format. Requires spark.sql.catalog.<ICEBERG_CATALOG> configured to
        org.apache.iceberg.spark.SparkCatalog with a hadoop warehouse."""
        ident = self._iceberg_ident(table)
        df.writeTo(ident).createOrReplace()
        return self.spark.table(ident)

    def write(self, table: str, df: DataFrame, counters: dict | None = None) -> dict:
        """Materialize df as the next snapshot of `table`; returns manifest."""
        prev = self.manifest(table)
        version = (prev["version"] + 1) if prev else 1
        tdir = os.path.join(self.warehouse, table)
        data_dir = os.path.join(tdir, f"v={version}")
        t0 = time.time()
        if self.iceberg:
            written = self._write_iceberg(table, df)
            lineage = partition_lineage(written)
        else:
            df.write.mode("overwrite").parquet(data_dir)
            lineage = file_lineage(data_dir)  # footers: zero Spark jobs
        man = {
            "table": table,
            "version": version,
            "rows": int(sum(p["rows"] for p in lineage)),
            "partitions": lineage,
            "counters": counters or {},
            "write_seconds": round(time.time() - t0, 3),
            "format": "iceberg" if self.iceberg else "parquet-snapshot",
        }
        os.makedirs(tdir, exist_ok=True)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(table))
        return man

    def read(self, table: str) -> DataFrame:
        m = self.manifest(table)
        if m is None:
            raise FileNotFoundError(f"no snapshot for table {table!r} in {self.warehouse}")
        if m.get("format") == "iceberg":
            return self.spark.table(self._iceberg_ident(table))
        return self.spark.read.parquet(
            os.path.join(self.warehouse, table, f"v={m['version']}")
        )

    def drop(self, table: str) -> None:
        import shutil

        tdir = os.path.join(self.warehouse, table)
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
