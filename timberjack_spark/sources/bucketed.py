"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a conv-keyed join or aggregation is the
exchange. Writing both sides bucketed by the join key (``bucketBy`` +
``saveAsTable``) stores each side pre-hash-partitioned into the same bucket
layout, so Catalyst plans the join with NO Exchange on either side — the
parquet scan itself satisfies the required hash distribution. The reference
CLI re-reads flat files per invocation (src/main.rs streaming loop); this is
the Spark-native answer for repeated analysis over the same corpus: pay the
shuffle once at write time, never again.

Local parquet ``saveAsTable`` stands in for the Iceberg/warehouse catalog of
a production deployment; the plan shape (bucketed scan, no exchange) is what
carries to the cluster and is regression-pinned in tests/test_bucketed.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` (optionally sorted
    within buckets, which additionally enables sort-merge joins without the
    per-task sort). ``n_buckets`` must match across tables that will be
    joined — same layout = zero-exchange join."""
    spark = df.sparkSession
    # a table whose catalog entry is gone but whose warehouse directory
    # survives (crashed run) would fail with LOCATION_ALREADY_EXISTS —
    # clear both so the write is idempotent. The metastore lower-cases names
    # and maps db-qualified tables to <warehouse>/<db>.db/<table>.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parts = table.lower().split(".")
    name, db = parts[-1], (parts[-2] if len(parts) > 1 else "default")
    base = warehouse.removeprefix("file:")
    loc = os.path.join(base, name) if db == "default" else os.path.join(base, f"{db}.db", name)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-layout bucketed tables on their bucket key. With both
    sides bucketed on ``on`` (same bucket count), the physical plan contains
    no Exchange — verify with ``df.explain()`` / the pinned plan test."""
    return spark.table(left_table).join(spark.table(right_table), on)
