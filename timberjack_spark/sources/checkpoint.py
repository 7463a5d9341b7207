"""Exactly-once resumable fan-out with a per-partition progress ledger.

Design (SURVEY.md §4 item 4): the unit of recoverable progress is a *bucket* —
``pmod(xxhash64(conv_id), n_buckets)`` — so progress is content-addressed and
identical across runs/cluster sizes. A run:

1. reads the ledger (tiny JSON marker per completed bucket — the file-based
   stand-in for Iceberg snapshot metadata; on Iceberg the commit itself is the
   marker and step 3 is ``overwritePartitions``);
2. processes ONLY incomplete buckets, in one distributed pass, writing
   ``bucket=K/category=C/`` partitions with dynamic partition overwrite
   (idempotent: a re-run of a half-written bucket replaces it, never
   duplicates);
3. writes a ledger marker per finished bucket, including its routed-row counts
   (the per-partition lineage/metrics record).

Killing the job between 2 and 3 re-does at most the unmarked buckets; marked
buckets are never rewritten. Counts are exact-once by construction.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEDGER_DIR = "_ledger"


def bucket_col(key: str = "conv_id", n_buckets: int = 8):
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


def completed_buckets(base_path: str) -> dict[int, dict]:
    ledger = os.path.join(base_path, LEDGER_DIR)
    out: dict[int, dict] = {}
    if os.path.isdir(ledger):
        for f in os.listdir(ledger):
            if f.startswith("bucket-") and f.endswith(".json"):
                with open(os.path.join(ledger, f)) as fh:
                    rec = json.load(fh)
                out[rec["bucket"]] = rec
    return out


def _mark_complete(base_path: str, bucket: int, counts: dict[str, int], elapsed: float) -> None:
    ledger = os.path.join(base_path, LEDGER_DIR)
    os.makedirs(ledger, exist_ok=True)
    tmp = os.path.join(ledger, f".bucket-{bucket}.json.tmp")
    rows = sum(counts.values())
    rec = {
        "bucket": bucket,
        "counts": counts,
        "rows": rows,
        "elapsed_sec": round(elapsed, 3),
        # per-partition throughput — the ledger doubles as the pipeline's
        # lineage AND metrics record (north rule): each bucket's commit says
        # what it held, when it landed, and how fast it moved
        "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, os.path.join(ledger, f"bucket-{bucket}.json"))  # atomic commit


def run_resumable_fanout(
    df: DataFrame,
    base_path: str,
    n_buckets: int = 8,
    commit_group_size: int | None = None,
    fail_after_groups: int | None = None,
    audit_readback: bool = False,
) -> dict:
    """Route ``df`` (must already carry a ``category`` column) to
    ``base_path/data/bucket=K/category=C``, resumably.

    ``commit_group_size`` buckets are written per commit (one distributed pass
    each — the Iceberg-commit granularity knob). Default: ALL incomplete
    buckets in a single pass, i.e. exactly one source scan on a clean run;
    smaller groups buy finer-grained resume at the cost of extra scans.
    ``fail_after_groups`` injects a crash (test hook for the resume contract).

    Ledger counts come from the SAME pass as the write: the commit group is
    persisted (memory-and-disk), the write materializes the cache, and the
    per-bucket groupBy reads the cache — one source scan per commit group.
    ``audit_readback=True`` additionally re-reads the written partitions and
    raises on any count divergence (an end-to-end audit; at 100 TB it is a
    second full scan of every sink, so it is opt-in).
    Returns {"processed": [...], "skipped": [...], "counts": {...}}.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    # set dynamic partition overwrite for OUR writes only; restore after — a
    # leaked 'dynamic' silently turns later unrelated mode('overwrite')
    # partitioned writes into partial-partition overwrites
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = completed_buckets(base_path)
    data_path = os.path.join(base_path, "data")

    bdf = df.withColumn("bucket", bucket_col(n_buckets=n_buckets))
    todo = [b for b in range(n_buckets) if b not in done]
    group = commit_group_size or max(len(todo), 1)
    groups = [todo[i : i + group] for i in range(0, len(todo), group)]
    processed = []
    try:
        for gi, ks in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError(f"injected failure after {fail_after_groups} commit groups")
            t0 = time.time()
            part = bdf.filter(F.col("bucket").isin(ks)).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            try:
                # dynamic overwrite: replaces exactly the bucket-in-ks/category=*
                # partitions; the write action populates the cache
                part.write.mode("overwrite").partitionBy("bucket", "category").parquet(data_path)
                per_bucket = (
                    part.groupBy("bucket", "category")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .collect()
                )
            finally:
                part.unpersist()
            if audit_readback:
                audit = (
                    spark.read.parquet(data_path)
                    .filter(F.col("bucket").isin(ks))
                    .groupBy("bucket", "category")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .collect()
                )
                want = {(r["bucket"], r["category"]): r["cnt"] for r in per_bucket}
                got = {(r["bucket"], r["category"]): r["cnt"] for r in audit}
                if want != got:
                    raise RuntimeError(
                        f"fan-out audit mismatch: wrote {want} but sinks hold {got}"
                    )
            elapsed = time.time() - t0
            for k in ks:
                counts = {r["category"]: r["cnt"] for r in per_bucket if r["bucket"] == k}
                _mark_complete(base_path, k, counts, elapsed / len(ks))
                processed.append(k)
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    all_done = completed_buckets(base_path)
    totals: dict[str, int] = {}
    for rec in all_done.values():
        for c, n in rec["counts"].items():
            totals[c] = totals.get(c, 0) + n
    total_rows = sum(totals.values())
    elapsed_total = round(sum(r.get("elapsed_sec") or 0 for r in all_done.values()), 3)
    return {
        "processed": processed,
        "skipped": sorted(done),
        "counts": totals,
        "metrics": {
            "total_rows": total_rows,
            "elapsed_sec": elapsed_total,
            "rows_per_sec": round(total_rows / elapsed_total, 1) if elapsed_total else None,
        },
    }
