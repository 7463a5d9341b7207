"""Micro-profiler for the parse stage. Builds a FRESH plan per timed run so
Spark's shuffle-stage reuse can't skip the scan (which silently zeroes naive
same-instance re-collect timings). Usage: python tools/profile_parse.py [sf]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timberjack_spark.fixtures import dim_role_df, dim_tool_df, transcripts_path
from timberjack_spark.functions.extract import generic_level, with_parsed
from timberjack_spark.functions.patterns import (
    JSON_LEVEL_KEYS,
    JSON_MESSAGE_KEYS,
    JSON_TIMESTAMP_KEYS,
    TIMESTAMP_RE,
)
from timberjack_spark.operators.enrich import enrich
from timberjack_spark.operators.route import with_category
from timberjack_spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(cores=cores, shuffle_partitions=max(cores, 1))
    P = transcripts_path(sf)

    def t(name, mk):
        mk().collect()
        t0 = time.time()
        mk().collect()
        print(f"TIME {name} {time.time() - t0:.2f}", flush=True)

    rd = lambda: spark.read.parquet(P)  # noqa: E731
    keys = JSON_LEVEL_KEYS + JSON_TIMESTAMP_KEYS + JSON_MESSAGE_KEYS
    al = [f"_j{i}" for i in range(len(keys))]

    t("contains_count", lambda: rd().filter(F.col("text").contains("ERROR")).groupBy().count())
    t("generic_level", lambda: rd().select(generic_level(F.col("text")).alias("x")).groupBy("x").count())
    t("ts_re", lambda: rd().select(F.regexp_extract("text", TIMESTAMP_RE, 1).alias("x")).groupBy("x").count())
    t("json_tuple15", lambda: rd().select(F.json_tuple(F.col("text"), *keys).alias(*al)).groupBy("_j0").count())
    t("levelhist", lambda: with_parsed(rd()).groupBy("level").count())
    t("parsed_cat", lambda: with_category(with_parsed(rd())).groupBy("category", "level").count())
    t(
        "flagship",
        lambda: enrich(with_category(with_parsed(rd())), dim_role_df(spark), dim_tool_df(spark))
        .groupBy("category", "level")
        .agg(F.count(F.lit(1)).alias("cnt")),
    )


if __name__ == "__main__":
    main()
