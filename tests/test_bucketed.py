"""Bucketed co-located joins: results equal the shuffle join, plan has no
Exchange (the 100-TB contract — pay the shuffle once at write time)."""

import pytest
from pyspark.sql import functions as F

from timberjack_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from timberjack_spark.fixtures import transcripts_path

    df = spark.read.parquet(transcripts_path("sf0.001"))
    convs = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    write_bucketed(df, "tj_turns_b", ["conv_id"], n_buckets=8, sort_cols=["conv_id"])
    write_bucketed(convs, "tj_convs_b", ["conv_id"], n_buckets=8, sort_cols=["conv_id"])
    yield df, convs
    spark.sql("DROP TABLE IF EXISTS tj_turns_b")
    spark.sql("DROP TABLE IF EXISTS tj_convs_b")


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    df, convs = bucketed_tables
    got = bucketed_join(spark, "tj_turns_b", "tj_convs_b", ["conv_id"])
    want = df.join(convs, "conv_id")
    assert got.count() == want.count() == df.count()
    s = got.agg(F.sum("n_turns")).first()[0]
    assert s == want.agg(F.sum("n_turns")).first()[0]


def _with_conf(spark, pairs: dict):
    """Set confs, returning the previous values for restoration."""
    prev = {}
    for k, v in pairs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return prev


def _restore_conf(spark, prev: dict):
    for k, v in prev.items():
        spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # the tiny test corpus would (correctly) broadcast, which hides the
    # bucketing; at 100 TB neither side broadcasts, so pin THAT plan shape:
    # disable broadcast + AQE for the plan inspection only
    prev = _with_conf(
        spark,
        {"spark.sql.autoBroadcastJoinThreshold": "-1", "spark.sql.adaptive.enabled": "false"},
    )
    try:
        got = bucketed_join(spark, "tj_turns_b", "tj_convs_b", ["conv_id"])
        plan = got._jdf.queryExecution().executedPlan().toString()
    finally:
        _restore_conf(spark, prev)
    # both scans satisfy the join's hash requirement from the bucket layout:
    # no Exchange on either side, and the scans read bucketed
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    # groupBy on the bucket key is satisfied by the table layout too
    prev = _with_conf(spark, {"spark.sql.adaptive.enabled": "false"})
    try:
        agg = spark.table("tj_turns_b").groupBy("conv_id").agg(F.count(F.lit(1)).alias("c"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        _restore_conf(spark, prev)
    assert "Exchange" not in plan, plan
