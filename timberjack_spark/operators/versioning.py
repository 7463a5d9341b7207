"""Corpus snapshot diff — release-to-release data versioning.

When a training corpus is rebuilt (new crawl, changed filters), the release
report needs WHAT changed: documents added, removed, modified (same id,
different text), and unchanged. That diff drives incremental downstream work
(re-embed only modified/added docs, invalidate only their chunks) and is the
audit trail for eval-set stability.

Scale shape: ONE full-outer join on the document id, comparing md5 text
hashes — never the texts. Both sides project to (id, 16-byte hash) before
the join, so the shuffle carries ~24 bytes/row; on bucketed/co-partitioned
release tables the exchange disappears entirely. Status is a pure CASE over
null-ness + hash equality: no skew (ids are unique per side), no second
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    curr_df: DataFrame,
    prev_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, status)`` per document present in EITHER release:
    ``added`` (only in current), ``removed`` (only in previous),
    ``modified`` (both, text hash differs), ``unchanged`` (both, same hash).

    Null-text semantics: md5(null) is null, and null hashes never compare
    equal in SQL — a doc whose text is null in BOTH releases is therefore
    reported ``modified`` (indistinguishable contents are not provably
    unchanged). Presence is judged by the id columns, not the hashes, so
    null-text docs still diff as added/removed correctly.
    """
    cur = curr_df.select(
        F.col(id_col).alias("_cid"), F.md5(F.col(text_col)).alias("_ch")
    )
    prev = prev_df.select(
        F.col(id_col).alias("_pid"), F.md5(F.col(text_col)).alias("_ph")
    )
    joined = cur.join(prev, cur["_cid"] == prev["_pid"], "full_outer")
    status = (
        F.when(F.col("_pid").isNull(), F.lit("added"))
        .when(F.col("_cid").isNull(), F.lit("removed"))
        .when(F.col("_ch") == F.col("_ph"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return joined.select(
        F.coalesce("_cid", "_pid").alias(id_col), status.alias("status")
    )
