"""Round-6 optimization measurement harness (bench.py is FROZEN — this file
carries the noop-sink isolation / plan capture work the optimization guide
§1 prescribes; cited from OPTIMIZATION_r06.md).

Mirrors bench.py's per-query methodology: one bench_queries-shaped session
(local[$SPARK_GRAFT_CPUS], shuffle = 2x cores), Arrow worker pre-warm, then
for each named query ONE untimed warm-up + min-of-N timed .collect() runs.
Optionally writes .explain("formatted") to plans/r06/<query>_<tag>.txt.

Usage:
  python tools/measure_r06.py q1 q2 ...            # time queries
  python tools/measure_r06.py --explain before q1  # also dump plans
  python tools/measure_r06.py --all                # every query
  python tools/measure_r06.py --runs 3 q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    explain_tag = None
    names: list[str] = []
    run_all = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--explain":
            explain_tag = args[i + 1]
            i += 2
        elif a == "--all":
            run_all = True
            i += 1
        else:
            names.append(a)
            i += 1

    from timberjack_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(cores=CPUS, shuffle_partitions=2 * CPUS, app_name="measure_r06")
    import __spark_entry__ as entrymod

    qfns = entrymod.queries()
    if run_all:
        names = list(qfns)

    # Arrow/Python worker pre-warm (same as bench.py's slow-query pass)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(256).repartition(CPUS).select(F.sum(_warm("id"))).collect()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = qfns[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        if explain_tag:
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}_{explain_tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        fn(spark, SF_DIR).collect()  # untimed warm-up
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        print(f"  {name}: {out[name]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
