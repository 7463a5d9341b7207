"""Recall contracts behind the approximate-operator DuckDB oracles.

The driver adjudicates d_minhash_pairs / d_simhash_pairs / e_lsh_topk /
e_cosine_pairs against EXACT oracles (all-pairs Jaccard, exact top-k,
all-pairs cosine). That equality holds only because, AT THE PINNED FIXTURE
SCALE (sf0.01, deterministic generator + hashes), the LSH candidate stages
achieve recall 1 with the configured amplification:

* minhash: bands=32 (r=2) at threshold 0.5,
* simhash: max_hamming=9 over 3-gram signatures,
* hyperplane LSH: 24 tables x 3 bits for top-3 / 16 tables x 10 bits for
  the 0.95-cosine pair query.

A different scale factor, seed, or document distribution can break that
bound WITHOUT any engine bug. These tests pin the contract on the same
fixture the driver reads, so a fixture change fails HERE with this
explanation, not as a mystery hash-mismatch in CORRECTNESS_r{N}.json.
(ADVICE r2 item 2.)
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    """Exact all-pairs shingle Jaccard >= 0.5 — the ground truth both the
    minhash and simhash driver oracles assume their candidates cover."""
    from timberjack_spark.operators.dedup import exact_jaccard_verify

    ids = docs.select(F.col("doc_id").alias("id_a"))
    ids_b = docs.select(F.col("doc_id").alias("id_b"))
    allpairs = ids.crossJoin(ids_b).filter(F.col("id_a") < F.col("id_b"))
    rows = exact_jaccard_verify(docs, allpairs, threshold=0.5).collect()
    return {(r["id_a"], r["id_b"]) for r in rows}


def test_minhash_oracle_recall_floor(docs, exact_pairs):
    from timberjack_spark.operators.dedup import minhash_near_dups

    got = {
        (r["id_a"], r["id_b"])
        # same capped config the driver entrypoint runs (__spark_entry__):
        # the recall==exact statement must pin what is actually adjudicated
        for r in minhash_near_dups(
            docs, threshold=0.5, bands=32, max_bucket_size=10_000
        ).collect()
    }
    # == (not >=): the verify stage makes precision exact, so equality IS the
    # recall-1 statement the driver oracle depends on
    assert got == exact_pairs and len(exact_pairs) > 0


def test_simhash_oracle_recall_floor(docs, exact_pairs):
    from timberjack_spark.operators.dedup import exact_jaccard_verify, simhash_near_dups

    cand = simhash_near_dups(
        docs, max_hamming=9, n=3, max_bucket_size=10_000  # entrypoint config
    ).select("id_a", "id_b")
    got = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_verify(docs, cand, threshold=0.5).collect()
    }
    assert got == exact_pairs and len(exact_pairs) > 0


def test_lsh_topk_oracle_recall_floor(spark):
    from timberjack_spark.operators.similarity import brute_force_topk, lsh_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {tuple(r) for r in brute_force_topk(e, q, k=3).collect()}
    got = {tuple(r) for r in lsh_topk(e, q, k=3, n_tables=24, bits_per_table=3).collect()}
    assert got == exact and len(exact) == 15


def test_cosine_pairs_oracle_recall_floor(spark):
    # the e_cosine_pairs query augments the corpus with +0.02 perturbed twins:
    # exactly one true pair per vector (cos >= 0.987), worst false pair 0.537
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["e_cosine_pairs"](spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    assert all(r["id_b"] == r["id_a"] + 10_000_000 and r["cos"] >= 0.95 for r in rows)
