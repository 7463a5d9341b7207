"""Vectorized Arrow/pandas-UDF grok stage (the north-rule extraction path).

One pandas UDF scans the text column once per Arrow batch and returns a struct
of every extracted column — level, timestamp, hour bucket, message, error
signature, unique-message key — so multi-pattern extraction costs a single pass
over the strings. Regexes are compiled once per executor (module import), and
all string work is ``pd.Series.str`` / batch-level, never a per-row Spark UDF.

Output is pinned by test to be identical to the pure-Catalyst projection in
:mod:`timberjack_spark.functions.extract`; the engine uses the expression path
by default (JVM codegen beats Arrow transfer for these three regexes) and this
UDF for the multi-pattern case where one Python pass over the batch replaces N
JVM regex scans.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .patterns import (
    BUCKET_LEN,
    ERROR_TYPE_RE,
    JSON_LEVEL_KEYS,
    JSON_MESSAGE_KEYS,
    JSON_TIMESTAMP_KEYS,
    LEVEL_RE,
    TIMESTAMP_RE,
)

# One leftmost-first pattern, two groups: g1 = whole level match, g2 = bracket word.
_LEVEL_BOTH = re.compile(
    r"(\[(?i:(ERROR|WARN|INFO|DEBUG|TRACE|SEVERE|WARNING|FINE))\]"
    r"|(?i:ERROR|WARN|INFO|DEBUG|TRACE|SEVERE|WARNING|FINE):)"
)
_TS = re.compile(TIMESTAMP_RE)
_ERR = re.compile(ERROR_TYPE_RE)

GROK_SCHEMA = T.StructType(
    [
        T.StructField("level", T.StringType()),
        T.StructField("ts_raw", T.StringType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("error_type", T.StringType()),
        T.StructField("msg_key", T.StringType()),
    ]
)


def _json_first(obj: dict, keys: list[str]) -> str | None:
    for k in keys:
        v = obj.get(k)
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, (int, float)):
            return json.dumps(v)
    return None


def grok_batch(text: pd.Series) -> pd.DataFrame:
    """Pure-pandas implementation (also used directly in tests)."""
    s = text.fillna("")

    # generic extractions, one vectorized pass each
    lv = s.str.extract(_LEVEL_BOTH)
    g_level = np.where(lv[1].notna(), lv[1], lv[0]).astype(object)
    g_level = pd.Series(g_level, index=s.index).fillna("").str.upper()
    g_ts = s.str.extract(_TS)[0].fillna("")
    err = s.str.extract(_ERR)[0].fillna("")

    parts = s.str.split("]")
    nparts = parts.str.len()
    second = parts.str[1].str.strip()
    msg_key = s.where(nparts < 2, second)

    trimmed = s.str.strip()
    jmask = trimmed.str.startswith("{") & trimmed.str.endswith("}")
    level = g_level.copy()
    ts_raw = g_ts.copy()
    message = s.copy()
    if jmask.any():
        # JSON rows only: parse each candidate once per batch (not a per-row UDF —
        # this loop runs inside one Arrow batch on the executor).
        j_level, j_ts, j_msg, idxs = [], [], [], []
        for idx, line in trimmed[jmask].items():
            try:
                obj = json.loads(line)
            except (ValueError, RecursionError):
                continue
            if not isinstance(obj, dict):
                continue
            idxs.append(idx)
            j_level.append(_json_first(obj, JSON_LEVEL_KEYS))
            j_ts.append(_json_first(obj, JSON_TIMESTAMP_KEYS))
            j_msg.append(_json_first(obj, JSON_MESSAGE_KEYS))
        if idxs:
            jl = pd.Series(j_level, index=idxs, dtype=object)
            jt = pd.Series(j_ts, index=idxs, dtype=object)
            jm = pd.Series(j_msg, index=idxs, dtype=object)
            level.loc[jl[jl.notna()].index] = jl[jl.notna()]
            ts_raw.loc[jt[jt.notna()].index] = jt[jt.notna()]
            message.loc[jm[jm.notna()].index] = jm[jm.notna()]

    return pd.DataFrame(
        {
            "level": level,
            "ts_raw": ts_raw,
            "bucket": ts_raw.str[:BUCKET_LEN],
            "message": message,
            "error_type": err,
            "msg_key": msg_key,
        }
    )


@pandas_udf(GROK_SCHEMA)
def grok_udf(text: pd.Series) -> pd.DataFrame:
    return grok_batch(text)


def with_parsed_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pandas-UDF twin of ``extract.with_parsed`` (mode='auto')."""
    g = grok_udf(F.col(text_col)).alias("_g")
    return df.withColumn("_g", g).select("*", "_g.*").drop("_g")
