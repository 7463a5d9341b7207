"""Streaming flavor: stream==batch equivalence + stateful operator."""

import pytest
from pyspark.sql import functions as F

from timberjack_spark.fixtures import transcripts_df
from timberjack_spark.functions.extract import with_parsed
from timberjack_spark.operators.route import with_category
from timberjack_spark.streaming.pipeline import run_session_stats_once, run_stream_once

N = 5000


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src") / "transcripts")
    transcripts_df(spark, N, partitions=8).write.parquet(d)
    return d


def test_stream_equals_batch(spark, src_dir):
    got = {
        (r["win_start"], r["level"]): r["cnt"]
        for r in run_stream_once(spark, src_dir, query_name="t_stream_eq").collect()
    }
    batch = with_parsed(spark.read.parquet(src_dir))
    expected = {
        (r["win_start"], r["level"]): r["cnt"]
        for r in batch.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("win_start"), "level"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_stateful_session_stats(spark, src_dir):
    out = run_session_stats_once(spark, src_dir, query_name="t_sessions")
    # memory sink in update mode may carry one row per trigger; take the last
    # update per conversation (max n_turns is monotonically the latest)
    rows = out.groupBy("conv_id").agg(
        F.max("n_turns").alias("n_turns"), F.max("n_errors").alias("n_errors")
    )
    got = {r["conv_id"]: (r["n_turns"], r["n_errors"]) for r in rows.collect()}
    batch = with_category(with_parsed(spark.read.parquet(src_dir)))
    expected = {
        r["conv_id"]: (r["n_turns"], r["n_errors"])
        for r in batch.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("category") == "errors").cast("long")).alias("n_errors"),
        )
        .collect()
    }
    assert got == expected
