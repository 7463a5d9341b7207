"""Enrich stage: broadcast hash joins against the role/tool lookup dimensions.

The reference has no joins (field values are only ever compared to CLI
literals, SURVEY.md §2.6); the north-star pipeline adds dimension enrichment.
Both dims are tiny (4 and 5 rows — and on a real deployment still just
catalogs), so they are explicitly ``broadcast()``: the join never shuffles the
10^12-row fact side, it stays a map-side hash probe inside the same codegen
stage as the parse projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(df: DataFrame, dim_role: DataFrame, dim_tool: DataFrame) -> DataFrame:
    """Left-join role/tool attributes onto the transcript frame.

    Left joins (not inner) so unknown roles/tools degrade to nulls instead of
    dropping turns — row counts through the pipeline must be conserved for the
    per-sink count contract.
    """
    return df.join(F.broadcast(dim_role), "role", "left").join(
        F.broadcast(dim_tool), "tool", "left"
    )
