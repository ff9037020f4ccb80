#!/usr/bin/env python
"""Replay the driver's CORRECTNESS gate locally at its own SF (sf0.01):
for every queries() entry, run Spark and (where an oracle exists) the
oracle_sql() DuckDB twin side-by-side, comparing row count, column names,
and order-insensitive value hashes — the exact comparison the driver
records in CORRECTNESS_r{N}.json. tests/test_entry_oracle.py does the
same at sf0.001 per-test; this harness exists because the data-derived
oracles (ANN band geometry, trained IVF centroids) embed constants from
the GATE table, so only an sf0.01 replay exercises the exact strings the
driver will run.

Usage: python BENCH/correctness_rehearsal.py [sf_dir]  (default sf0.01)
Prints one line per query + a summary JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def main() -> None:
    import __spark_entry__ as entrymod

    from relieff_lsh_spark.session import get_spark

    spark = get_spark(app_name="correctness-rehearsal",
                      master="local[32]", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    bad = []
    for name in sorted(queries):
        sdf = queries[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no_oracle)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and _value_hash(scols, srows) == _value_hash(dcols, drows)
        )
        print(f"{name}: rows={len(srows)}/{len(drows)} "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            bad.append(name)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "queries": len(queries),
                      "with_oracle": len(oracles), "mismatches": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
