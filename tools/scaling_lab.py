"""Scaling-efficiency lab: measure the flagship at local[8] vs local[32] under
different JVM/partitioning configs to find (and kill) the cpu-work inflation
the round-1 driver bench recorded (277 cpu-s @8 -> 440 @32 = 1.6x).

IMPORTANT: the py4j gateway JVM launches ONCE per python process, so
spark.driver.extraJavaOptions only applies to the FIRST session — run one
config per process. Usage:
    python tools/scaling_lab.py <gc_threads> <shuffle_parts:fixed|2x> <files> [turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_cpu() -> float:
    import subprocess

    pid = subprocess.run(
        ["bash", "-c", "ps -o pid= -C java | head -1"], capture_output=True, text=True
    ).stdout.strip()
    if not pid:
        return 0.0
    with open(f"/proc/{pid}/stat") as fh:
        p = fh.read().split()
    return (int(p[13]) + int(p[14])) / os.sysconf("SC_CLK_TCK")


def main():
    gc_threads = int(sys.argv[1])
    shuffle_mode = sys.argv[2]
    files = int(sys.argv[3])
    turns = int(sys.argv[4]) if len(sys.argv) > 4 else 18_000_000

    from bench import flagship
    from timberjack_spark.session import get_spark, stop_spark

    java_opts = (
        f"-XX:ParallelGCThreads={gc_threads} -XX:ConcGCThreads={max(gc_threads // 4, 1)} "
        f"-XX:CICompilerCount=4"
    )
    # first session fixes the JVM opts for the whole process
    spark = get_spark(cores=32, app_name="lab_gen", extra_conf={
        "spark.driver.extraJavaOptions": java_opts,
    })
    from timberjack_spark.fixtures import bench_transcripts_dir

    src = bench_transcripts_dir(spark, turns, partitions=files)

    results = {}
    for cores in (8, 32):
        stop_spark()
        sp = 64 if shuffle_mode == "fixed" else 2 * cores
        spark = get_spark(
            cores=cores, shuffle_partitions=sp, app_name=f"lab{cores}",
            extra_conf={"spark.sql.adaptive.enabled": "false",
                        "spark.driver.extraJavaOptions": java_opts},
        )
        flagship(spark, src)  # warm
        walls, cpus = [], []
        for _ in range(3):
            c0, t0 = jvm_cpu(), time.perf_counter()
            flagship(spark, src)
            walls.append(time.perf_counter() - t0)
            cpus.append(jvm_cpu() - c0)
        i = walls.index(min(walls))
        results[cores] = {"wall": round(walls[i], 2), "cpu": round(cpus[i], 1),
                          "walls": [round(w, 2) for w in walls]}
    r8, r32 = results[8], results[32]
    out = {
        "cfg": {"gc": gc_threads, "shuffle": shuffle_mode, "files": files, "turns": turns},
        "t8": r8["wall"], "t32": r32["wall"], "cpu8": r8["cpu"], "cpu32": r32["cpu"],
        "eff": round(r8["wall"] / r32["wall"] / 4, 3),
        "work_eff": round(r8["cpu"] / r32["cpu"], 3) if r32["cpu"] else None,
        "walls8": r8["walls"], "walls32": r32["walls"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
