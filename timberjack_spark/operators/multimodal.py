"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct; decode/feature stages are Arrow-batched ``mapInPandas``
operators so payload bytes never round-trip through per-row Python pickling.

The actual image/audio decoders are NOT available in this environment — the
decode step is stubbed behind a clearly-marked ``NotImplementedError`` with a
deterministic digest-based fake used for plumbing tests. The Spark-side
contract (schema, batch shapes, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus: payload = UTF-8 bytes
    of the text (stands in for encoded image bytes), metadata derived from id."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
        (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
        (F.col(id_col) * 33 % 60000).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL DECODE STUB: requires an image codec (PIL/cv2), absent here."""
    raise NotImplementedError(
        "image decoding requires PIL/cv2 which are not installed in this "
        "environment; use fake_features() for plumbing tests"
    )


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic digest-based stand-in for a decoded feature vector."""
    digest = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(digest[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams record batches; each batch is processed with
    numpy/hashlib (vectorized per batch, no per-row Spark UDF). Set
    ``real_decode=True`` once codecs exist — the stub raises loudly.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if real_decode:
                feats = [decode_image(p) for p in payloads]  # NotImplementedError by design
            else:
                feats = [fake_features(p).tolist() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int32"),
                    "sha256": payloads.map(lambda p: hashlib.sha256(p or b"").hexdigest()),
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
