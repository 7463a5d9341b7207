"""S3 — sampled format detection (driver-side, NOT a distributed op).

Mirrors the reference registry probe (/root/reference/src/main.rs:42-98,
src/parser/mod.rs:71-97, src/parser/json.rs:98-123): sample the first <=10
non-empty lines, declare JSON when >=40% are brace-framed valid JSON objects
containing a timestamp-ish AND a level-ish key (substring checks, exactly as
the reference does), else Generic. The result picks the parse ``mode`` for the
distributed plan; detection itself never touches more than the sample.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import _WS

SAMPLE_LINES = 10
JSON_THRESHOLD_PCT = 40

_TS_HINTS = ("timestamp", "time", "@timestamp")
_LEVEL_HINTS = ("level", "severity", "log_level")


def looks_like_json_line(line: str) -> bool:
    t = line.strip(_WS)
    if not (t.startswith("{") and t.endswith("}")):
        return False
    try:
        json.loads(t)
    except ValueError:
        return False
    return any(h in t for h in _TS_HINTS) and any(h in t for h in _LEVEL_HINTS)


def detect_format(df: DataFrame, text_col: str = "text") -> str:
    """Returns 'json' or 'generic' from a <=10-line driver-side sample."""
    sample = [
        r[0]
        for r in df.select(text_col)
        .filter(F.length(F.col(text_col)) > 0)
        .limit(SAMPLE_LINES)
        .collect()
    ]
    if not sample:
        return "generic"
    valid = sum(1 for line in sample if looks_like_json_line(line))
    return "json" if valid * 100 // len(sample) >= JSON_THRESHOLD_PCT else "generic"
