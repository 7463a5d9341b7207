"""Full-box (32-thread) work-inflation lab — VERDICT r2 item 7.

At 32 concurrent parse threads this box's single-socket DRAM saturates and
flagship cpu-work inflates ~1.3x vs 8 threads. This lab re-measures the
inflation under candidate configurations (file-split size, GC choice) to see
whether any of it is tunable rather than a genuine bandwidth ceiling.

Each variant runs in a FRESH subprocess: driver-JVM options (GC flags) bind
when the py4j gateway launches, so they cannot be changed inside one Python
process. cpu-seconds (utime+stime of the JVM) is the interference-immune
metric; wall is reported for context only.

Usage: python tools/tune_fullbox.py            # run all variants
       python tools/tune_fullbox.py <variant>  # subprocess entry (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Each variant pins the G1 region knob EXPLICITLY via SPARK_GRAFT_G1_REGION
# ("" = stock JVM choice): session.py now defaults to 32m regions (the r3
# winner), so baselines must override it back to measure the untuned JVM.
# (The 434/382/386/567 cpu-s figures in session.py/BASELINE.md were measured
# before that default landed, with the stock region size in the baselines.)
VARIANTS: dict[str, dict] = {
    "base8": {"cores": 8, "conf": {}, "java": "", "g1_region": ""},
    "base32": {"cores": 32, "conf": {}, "java": "", "g1_region": ""},
    "mpb64": {"cores": 32, "conf": {"spark.sql.files.maxPartitionBytes": "64m"}, "java": "", "g1_region": ""},
    "mpb32": {"cores": 32, "conf": {"spark.sql.files.maxPartitionBytes": "32m"}, "java": "", "g1_region": ""},
    "parallelgc": {"cores": 32, "conf": {}, "java": "-XX:+UseParallelGC", "g1_region": ""},
    "g1region32": {"cores": 32, "conf": {}, "java": "", "g1_region": "32m"},
    "combo": {"cores": 32, "conf": {"spark.sql.files.maxPartitionBytes": "64m"},
              "java": "", "g1_region": "32m"},
    "combo8": {"cores": 8, "conf": {"spark.sql.files.maxPartitionBytes": "64m"},
               "java": "", "g1_region": "32m"},
    # the ACTUAL committed-bench configuration (timed_flagship pins 4m splits
    # for 16-core wave packing; G1 32m is the session default) at both ends of
    # the full-box pair — r3's committed 1.47x inflation was measured HERE
    # while the lab's 1.28x came from the mpb32 variants above, so these
    # variants close that gap and answer whether the 4m split size itself
    # drives the committed inflation (r4, VERDICT #5)
    "bench4m_8": {"cores": 8, "conf": {"spark.sql.files.maxPartitionBytes": "4m"},
                  "java": "", "g1_region": "32m"},
    "bench4m_32": {"cores": 32, "conf": {"spark.sql.files.maxPartitionBytes": "4m"},
                   "java": "", "g1_region": "32m"},
    "g1mpb32_8": {"cores": 8, "conf": {"spark.sql.files.maxPartitionBytes": "32m"},
                  "java": "", "g1_region": "32m"},
    "g1mpb32_32": {"cores": 32, "conf": {"spark.sql.files.maxPartitionBytes": "32m"},
                   "java": "", "g1_region": "32m"},
    # thread sweep at the bench config: the DRAM-ceiling signature is cpu-work
    # FLAT through the low thread counts and inflating only as concurrency
    # approaches the socket's bandwidth (r4 measured: 1.354x at 4m splits vs
    # 1.424x at 32m — config-invariant, so not a split/GC artifact)
    "sweep4": {"cores": 4, "conf": {"spark.sql.files.maxPartitionBytes": "4m"},
               "java": "", "g1_region": "32m"},
    "sweep16": {"cores": 16, "conf": {"spark.sql.files.maxPartitionBytes": "4m"},
                "java": "", "g1_region": "32m"},
    "sweep24": {"cores": 24, "conf": {"spark.sql.files.maxPartitionBytes": "4m"},
                "java": "", "g1_region": "32m"},
}


def run_variant(name: str) -> None:
    v = VARIANTS[name]
    # ALWAYS assign both env knobs (never inherit a stale value from the
    # launching shell — the java flags bind at gateway launch)
    os.environ["SPARK_GRAFT_EXTRA_JAVA"] = v["java"]
    os.environ["SPARK_GRAFT_G1_REGION"] = v.get("g1_region", "")
    from bench import BENCH_TURNS, _jvm_cpu_seconds, flagship

    from timberjack_spark.fixtures import bench_transcripts_dir
    from timberjack_spark.session import get_spark

    spark = get_spark(
        cores=v["cores"],
        shuffle_partitions=2 * v["cores"],
        app_name=f"tune_{name}",
        extra_conf={"spark.sql.adaptive.enabled": "false", **v["conf"]},
    )
    src = bench_transcripts_dir(spark, BENCH_TURNS, partitions=128)
    flagship(spark, src)  # warm
    best_wall, best_cpu = float("inf"), 0.0
    for _ in range(2):
        c0 = _jvm_cpu_seconds()
        t0 = time.perf_counter()
        flagship(spark, src)
        wall = time.perf_counter() - t0
        if wall < best_wall:
            best_wall, best_cpu = wall, _jvm_cpu_seconds() - c0
    print(json.dumps({"variant": name, "cores": v["cores"],
                      "wall": round(best_wall, 2), "cpu": round(best_cpu, 1)}))


def main() -> None:
    results = {}
    only = os.environ.get("TUNE_VARIANTS")
    names = only.split(",") if only else list(VARIANTS)
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(name, "FAILED", out.stderr[-500:])
            continue
        rec = json.loads(line[-1])
        results[name] = rec
        print(rec)
    # pair each 32-core variant with the 8-core run of the SAME config when
    # present (bench4m_32/bench4m_8, g1mpb32_32/g1mpb32_8, combo/combo8),
    # falling back to base8 — inflation is only meaningful same-config
    pairs = {"bench4m_32": "bench4m_8", "g1mpb32_32": "g1mpb32_8", "combo": "combo8"}
    for name, rec in results.items():
        if rec["cores"] != 32:
            continue
        low = pairs.get(name, "base8")
        if low in results:
            c8 = results[low]["cpu"]
            print(f"{name} vs {low}: work_inflation={rec['cpu'] / c8:.3f} wall={rec['wall']}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        main()
