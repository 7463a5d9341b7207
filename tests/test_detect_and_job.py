"""S3 format detection + the spark-submit job entry (driven as a subprocess)."""

import json
import os
import subprocess
import sys

import pytest

from timberjack_spark.fixtures import transcripts_path
from timberjack_spark.sources.detect import detect_format, looks_like_json_line

JSON_LINE = '{"timestamp":"2025-03-21T14:00:00Z","level":"ERROR","message":"x"}'
PLAIN_LINE = "2025-03-21 14:00:00,123 [ERROR] plain"


def test_looks_like_json_line():
    assert looks_like_json_line(JSON_LINE)
    assert not looks_like_json_line(PLAIN_LINE)
    assert not looks_like_json_line('{"no_hints": 1}')
    assert not looks_like_json_line("{not json}")


def test_detect_format_threshold(spark):
    # 40% json -> json; below -> generic (reference threshold semantics)
    rows_json = [(JSON_LINE,)] * 4 + [(PLAIN_LINE,)] * 6
    rows_plain = [(JSON_LINE,)] * 3 + [(PLAIN_LINE,)] * 7
    assert detect_format(spark.createDataFrame(rows_json, "text string")) == "json"
    assert detect_format(spark.createDataFrame(rows_plain, "text string")) == "generic"
    assert detect_format(spark.createDataFrame([], "text string")) == "generic"


def test_detect_on_fixture(spark):
    # mixed corpus: only ~1/13 rows are JSON -> generic overall
    df = spark.read.parquet(transcripts_path("sf0.001"))
    assert detect_format(df) == "generic"


@pytest.mark.slow
def test_run_pipeline_job(tmp_path):
    """Drive jobs/run_pipeline.py end-to-end as a real subprocess (the
    spark-submit surface), including a resume no-op second run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "out")
    cmd = [
        sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
        "--input", transcripts_path("sf0.001"), "--output", out,
        "--buckets", "4", "--local-cores", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=600, cwd=repo)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["total_count"] == 6000
    assert sum(s1["sink_counts"].values()) == 6000
    assert sorted(s1["buckets_processed"]) == [0, 1, 2, 3]

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600, cwd=repo)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["buckets_processed"] == [] and s2["buckets_skipped"] == [0, 1, 2, 3]
    assert s2["sink_counts"] == s1["sink_counts"]

    assert os.path.exists(os.path.join(out, "run_summary.json"))
