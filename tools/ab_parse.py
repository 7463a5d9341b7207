"""Interleaved A/B of old vs new parse expressions (min of N, one process) —
machine timing variance is large, so only same-process interleaved comparisons
are trustworthy."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timberjack_spark.fixtures import transcripts_path
from timberjack_spark.functions.patterns import ANOMALY_RE, ERROR_TYPE_RE, LEVEL_RE, TIMESTAMP_RE
from timberjack_spark.session import get_spark

spark = get_spark(cores=1, shuffle_partitions=1)
P = transcripts_path(sys.argv[1] if len(sys.argv) > 1 else "sf0.1")
rd = lambda: spark.read.parquet(P)  # noqa: E731

def old_level():
    t = F.col("text")
    m0 = F.regexp_extract(t, LEVEL_RE, 0)
    m1 = F.regexp_extract(t, LEVEL_RE, 1)
    x = F.when(m0 == "", F.lit("")).otherwise(F.upper(F.when(m1 == "", m0).otherwise(m1)))
    return rd().select(x.alias("x")).groupBy("x").count()

def new_level():
    from timberjack_spark.functions.extract import generic_level
    return rd().select(generic_level(F.col("text")).alias("x")).groupBy("x").count()

def old_ts():
    return rd().select(F.regexp_extract("text", TIMESTAMP_RE, 1).alias("x")).groupBy("x").count()

def new_ts():
    from timberjack_spark.functions.extract import generic_timestamp
    return rd().select(generic_timestamp(F.col("text")).alias("x")).groupBy("x").count()

def old_err():
    return rd().select(F.regexp_extract("text", ERROR_TYPE_RE, 1).alias("x")).groupBy("x").count()

def new_err():
    from timberjack_spark.functions.extract import error_type
    return rd().select(error_type(F.col("text")).alias("x")).groupBy("x").count()

def old_anom():
    return rd().select(F.col("text").rlike(ANOMALY_RE).alias("x")).groupBy("x").count()

def new_anom():
    from timberjack_spark.operators.route import _anomaly_pred
    return rd().select(_anomaly_pred(F.col("text")).alias("x")).groupBy("x").count()

PAIRS = [("level", old_level, new_level), ("ts", old_ts, new_ts),
         ("err", old_err, new_err), ("anom", old_anom, new_anom)]

N = int(os.environ.get("AB_RUNS", "3"))
for name, old, new in PAIRS:
    old().collect(); new().collect()  # warm codegen
    to, tn = 1e9, 1e9
    for _ in range(N):
        t0 = time.time(); old().collect(); to = min(to, time.time() - t0)
        t0 = time.time(); new().collect(); tn = min(tn, time.time() - t0)
    print(f"AB {name}: old={to:.2f}s new={tn:.2f}s speedup={to/tn:.2f}x", flush=True)
