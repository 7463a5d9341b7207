"""Sliding-window document chunking for retrieval / embedding pipelines.

The chunking step a RAG or embedding pipeline runs before vectorizing: split
each document into fixed token windows with a configurable stride (overlap =
window - stride), with stable chunk ids. Chunk identity is a pure function of
(doc text, window, stride) — re-running or repartitioning never renumbers a
chunk, so downstream vector stores can upsert by (doc_id, chunk_idx).

Scale shape: tokenize + windowed slice + posexplode are all JVM built-in
expressions over one scan — NO shuffle anywhere, trivially parallel at any
corpus size. Output volume is input tokens x (window/stride) overlap factor;
choose stride close to window when the index must stay near corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import ws_trim
from ..plans import oracle as osql


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, chunk_idx, n_tokens, chunk_text)`` — token windows of size
    ``window`` starting every ``stride`` tokens (0-based ``chunk_idx`` in
    document order; the final chunk may be shorter). Tokenization rides the
    shared contract (ws_trim + WS-class split); null/empty documents emit no
    chunks. A window start is emitted iff it is < the document's token count,
    so no empty trailing chunk exists and — provided ``stride <= window`` —
    every token lands in >= 1 chunk (with ``stride > window`` the operator
    still runs but tokens between a window's end and the next start are
    deliberately skipped: that is subsampling, not coverage)."""
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1: {window}, {stride}")
    toks = F.split(ws_trim(F.col(text_col)), osql.WS_CLASS_RE + "+")
    base = (
        df.select(F.col(id_col), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter((F.col("n") >= 1) & (F.element_at("toks", 1) != F.lit("")))
    )
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    return base.select(
        F.col(id_col),
        F.col("n"),
        F.col("toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.least(F.lit(window), F.col("n") - F.col("start")).alias("n_tokens"),
        F.array_join(F.slice("toks", F.col("start") + 1, window), " ").alias("chunk_text"),
    )
