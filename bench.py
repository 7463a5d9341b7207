"""Benchmark harness: flagship-pipeline throughput + per-query timings.

Runs the flagship parse -> enrich -> route -> aggregate pipeline over the
deterministic transcript fixture at $SPARK_GRAFT_SF_DIR scale, at TWO local
parallelism levels (local[N/4] and local[N], shuffle partitions scaled
proportionally) to evidence the north rule's N-vs-4N scaling-efficiency
criterion in this single-box sandbox, then times every __spark_entry__ query.

Prints ONE JSON line:
  {"metric": "flagship_e2e_sec", "value": <sec at local[N]>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput_turns_per_sec": ...,
   "scaling": {"cores_low": ..., "t_low": ..., "cores_high": ..., "t_high": ...,
                "efficiency": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "2"))
# flagship/scaling corpus size: large enough that task work dominates fixed
# per-job overheads (a 600k-row corpus finishes in under a second at local[32],
# which measures the scheduler, not the engine)
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "6000000"))


def flagship(spark, src_path: str):
    """One-pass parse -> enrich -> route -> per-(category, level) counts."""
    from pyspark.sql import functions as F

    from timberjack_spark.fixtures import dim_role_df, dim_tool_df
    from timberjack_spark.functions.extract import with_parsed
    from timberjack_spark.operators.enrich import enrich
    from timberjack_spark.operators.route import with_category

    df = spark.read.parquet(src_path)
    routed = enrich(
        with_category(with_parsed(df)), dim_role_df(spark), dim_tool_df(spark)
    )
    return (
        routed.groupBy("category", "level")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


def timed_flagship(cores: int, src_path: str, runs: int = RUNS) -> float:
    from timberjack_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, app_name=f"bench{cores}")
    flagship(spark, src_path)  # warm-up: JVM JIT, parquet footers, codegen
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        flagship(spark, src_path)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from timberjack_spark.fixtures import bench_transcripts_dir
    from timberjack_spark.session import get_spark, stop_spark

    # materialize the multi-file bench corpus once (distributed generator)
    spark = get_spark(cores=CPUS, shuffle_partitions=2 * CPUS, app_name="bench_gen")
    src = bench_transcripts_dir(spark, BENCH_TURNS)
    n_turns = BENCH_TURNS

    low_cores = max(CPUS // 4, 1)
    t_low = timed_flagship(low_cores, src)
    t_high = timed_flagship(CPUS, src)
    # ideal: t_high == t_low / 4; efficiency = actual speedup / ideal speedup
    efficiency = (t_low / t_high) / (CPUS / low_cores)

    # per-query timings on the high-parallelism session
    stop_spark()
    spark = get_spark(cores=CPUS, shuffle_partitions=2 * CPUS, app_name="bench_queries")
    import __spark_entry__ as entrymod

    qtimes = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "flagship_e2e_sec",
        "value": round(t_high, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "n_turns": n_turns,
        "throughput_turns_per_sec": round(n_turns / t_high, 1),
        "scaling": {
            "cores_low": low_cores,
            "t_low_sec": round(t_low, 3),
            "cores_high": CPUS,
            "t_high_sec": round(t_high, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
