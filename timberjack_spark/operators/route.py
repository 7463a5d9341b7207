"""Router: derive a category per turn and fan rows out to per-category sinks.

Categories (FIXTURES.md §3, first match wins):
  errors     — extracted level in {ERROR, SEVERE} OR an error-signature match
  tool-calls — an actual tool invocation (tool != '' or role == 'tool')
  anomalies  — anomaly tokens in the text without an error-level
  dialogue   — everything else

The fan-out itself is the idiomatic single-pass design (SURVEY.md §4.2): ONE
write partitioned by ``category`` — Spark has no multi-insert, and N filtered
writes would scan the source N times. Per-sink counts come from the same pass
via ``groupBy(category)``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.patterns import ANOMALY_RE

CATEGORIES = ["errors", "tool-calls", "anomalies", "dialogue"]

# ANOMALY_RE is a pure literal alternation, so a multi-contains disjunction is
# semantically identical (boolean match, order irrelevant) and runs as
# codegen'd StringContains instead of a regex scan
ANOMALY_TOKENS = ["timeout", "OutOfMemoryError", "rate limit exceeded", "query took"]


def _anomaly_pred(text: Column) -> Column:
    pred = F.lit(False)
    for tok in ANOMALY_TOKENS:
        pred = pred | text.contains(tok)
    return pred


def errors_pred(level: Column = None, error_type: Column = None) -> Column:
    """The router's first-match 'errors' branch as a standalone predicate:
    ``category == 'errors'`` is true iff this is (first match wins), so a
    consumer that only needs the error flag can evaluate THIS instead of the
    full 4-branch case-when (which drags the anomaly multi-contains and
    tool/role compares into every row — measured on the streaming
    conv-stats drain, where the flag is the only category use)."""
    level = level if level is not None else F.col("level")
    error_type = error_type if error_type is not None else F.col("error_type")
    return F.upper(level).isin("ERROR", "SEVERE") | (error_type != "")


def category_col(
    level: Column = None, error_type: Column = None, tool: Column = None,
    role: Column = None, text: Column = None,
) -> Column:
    tool = tool if tool is not None else F.col("tool")
    role = role if role is not None else F.col("role")
    text = text if text is not None else F.col("text")
    return (
        F.when(errors_pred(level, error_type), F.lit("errors"))
        .when((tool != "") | (role == "tool"), F.lit("tool-calls"))
        .when(_anomaly_pred(text), F.lit("anomalies"))
        .otherwise(F.lit("dialogue"))
    )


def with_category(df: DataFrame) -> DataFrame:
    """Requires the parse projection (level/error_type columns) to be present."""
    return df.withColumn("category", category_col())


def sink_counts(df: DataFrame) -> DataFrame:
    """Per-sink routed-row counts (the parity contract with the reference's
    per-category aggregates), deterministic order."""
    return (
        df.groupBy("category").agg(F.count(F.lit(1)).alias("cnt")).orderBy("category")
    )


def fan_out_write(
    df: DataFrame, base_path: str, mode: str = "overwrite", audit_readback: bool = False
) -> dict[str, int]:
    """Single-pass fan-out: write once, partitioned by category.

    On Iceberg deployments this is the same plan against a partitioned Iceberg
    table (``df.writeTo(tbl).overwritePartitions()``); the sandbox has no
    Iceberg runtime jar, so the file-based sink keeps the identical layout
    (``category=<sink>/`` directories).

    Per-sink counts come from the same cached pass as the write (one source
    scan). ``audit_readback=True`` re-reads the written sinks and raises on
    divergence — an end-to-end audit that costs a second full sink scan, so it
    is opt-in rather than the default at 100 TB.
    """
    from pyspark import StorageLevel

    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            cached.write.mode(mode)
            .partitionBy("category")
            .parquet(os.path.join(base_path, "routed"))
        )
        counts = {r["category"]: r["cnt"] for r in sink_counts(cached).collect()}
    finally:
        cached.unpersist()
    if audit_readback:
        written = df.sparkSession.read.parquet(os.path.join(base_path, "routed"))
        got = {r["category"]: r["cnt"] for r in sink_counts(written).collect()}
        if got != counts:
            raise RuntimeError(f"fan-out audit mismatch: wrote {counts} but sinks hold {got}")
    return counts
