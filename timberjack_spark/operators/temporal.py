"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are expressed as compositions of built-in DataFrame ops chosen for their
shuffle behavior at scale — no per-key Python, no cartesian products:

* ``asof_join`` — the union + running-``last`` trick: tag both sides, union,
  one window over (key, time) carrying the right-side payload forward, keep
  left rows. Exactly ONE shuffle on the join key for any data size (a naive
  implementation joins then ranks, shuffling |left| x |right-per-key| rows;
  pandas ``merge_asof`` per group would serialize through Python).
* ``range_join_count`` — time-bin blocking: with a window of width w, a right
  row can only serve left rows whose window start falls in its bin or the one
  before, so exploding the LEFT side into 2 candidate bins turns the
  inequality join into an equi-join on (key, bin) + a residual range filter.
  Shuffle is 2x|left| + |right| rows, never the cross product.

The DuckDB oracles use the native ``ASOF JOIN`` / inequality join, so the
driver adjudicates these against an independent implementation of the same
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row of the
    same key with ``right_ts <= left_ts`` (inclusive; nulls when none).

    Ties on ``right_ts`` are broken by ``tiebreak_col`` (greatest wins) so the
    result is deterministic — the property that lets a SQL oracle reproduce it
    bit-for-bit.
    """
    tb = tiebreak_col or payload_cols[0]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        payload.alias("_payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.select(F.col(tb)).schema[0].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts -> inclusive asof;
    # among right ties the greatest tiebreak lands nearest the left row
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_ts", "_side", "_tb", "_payload")
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col("_m")[c])
    return out.drop("_m")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count of right rows of the same key with
    ``left_ts + lower_sec <= right_ts < left_ts + upper_sec``.

    Implemented as bin blocking (see module docstring): bin width equals the
    window width, every left row lands in the two bins its window can span,
    the join is an equi-join on (key, bin), and the exact range filter runs on
    the joined rows. Left rows with no match keep count 0 (left join).
    """
    width = upper_sec - lower_sec
    if width <= 0:
        raise ValueError("upper_sec must be greater than lower_sec")
    # Every left row gets a surrogate id BEFORE the 2-bin explode, and the
    # de-explode aggregates on that id alone: grouping by the left columns
    # (the round-2 implementation) silently merged duplicate left rows into
    # one output row with summed counts, and failed outright for
    # non-groupable column types (maps). The payload columns ride through
    # ``first()`` — both exploded copies of a row carry identical values, so
    # first() is deterministic, and map/array payloads stay legal.
    left = left.withColumn("_lrid", F.monotonically_increasing_id())
    # NTZ timestamps cast via instant type first (session TZ is pinned UTC,
    # so the instant is unchanged); double keeps microsecond precision
    # (epoch ~1.7e9 s needs ~2^51 distinct us values, inside the 53-bit mantissa)
    l_epoch = F.col(left_ts).cast("timestamp").cast("double")
    r_epoch = F.col(right_ts).cast("timestamp").cast("double")
    start_bin = F.floor((l_epoch + lower_sec) / width).cast("long")
    l = left.withColumn("_bin", F.explode(F.array(start_bin, start_bin + 1)))
    r = right.select(
        *key_cols,
        r_epoch.alias("_r_epoch"),
        F.floor(r_epoch / width).cast("long").alias("_bin"),
    )
    joined = l.join(r, [*key_cols, "_bin"], "left").withColumn(
        "_hit",
        F.when(
            (F.col("_r_epoch") >= l_epoch + lower_sec)
            & (F.col("_r_epoch") < l_epoch + upper_sec),
            1,
        ).otherwise(0),
    )
    payload_cols = [c for c in left.columns if c != "_lrid"]
    return (
        joined.groupBy("_lrid")
        .agg(
            *[F.first(c).alias(c) for c in payload_cols],
            F.sum("_hit").cast("long").alias(count_alias),
        )
        .drop("_lrid")
    )
