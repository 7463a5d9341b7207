"""Similarity search: exact brute-force vs numpy oracle; LSH recall vs exact."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timberjack_spark.operators.similarity import brute_force_topk, cosine_near_dup_pairs, lsh_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def np_oracle():
    pdf = pd.read_parquet(EMB)
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    return ids, Mn


def np_topk(ids, Mn, qid, k):
    qi = np.where(ids == qid)[0][0]
    cos = Mn @ Mn[qi]
    order = sorted(
        ((round(c, 6), i) for c, i in zip(cos, ids) if i != qid),
        key=lambda t: (-t[0], t[1]),
    )
    return [(i, c) for c, i in order[:k]]


def test_brute_force_matches_numpy(spark, emb, np_oracle):
    ids, Mn = np_oracle
    queries = emb.filter(F.col("vec_id") < 5)
    got = brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos"]))
    for qid in range(5):
        expected = np_topk(ids, Mn, qid, 5)
        rows = sorted(by_q[qid])
        assert [(nid) for _, nid, _ in rows] == [nid for nid, _ in expected]
        for (_, _, c), (_, ec) in zip(rows, expected):
            assert abs(c - ec) < 2e-6


def test_lsh_recall_against_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, f"LSH recall too low: {recall}"
    # and candidates that were found carry the exact cosine
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9


def test_ivf_assignment_and_recall(spark, emb):
    from timberjack_spark.operators.similarity import (
        assign_nearest_centroid,
        ivf_topk,
        label_centroids,
    )

    cents = label_centroids(emb)
    n_labels = cents.count()
    assert n_labels == emb.select("label").distinct().count()
    assigned = assign_nearest_centroid(emb, cents)
    assert assigned.count() == emb.count()          # every vector lands in one cell

    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).collect()
    # probing ALL cells must recover the exact result (IVF == brute force)
    full = ivf_topk(emb, queries, k=5, n_probe=n_labels).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in full} == {
        (r["query_id"], r["neighbor_id"]) for r in exact
    }
    # limited probes trade recall for touched cells
    part = ivf_topk(emb, queries, k=5, n_probe=max(n_labels // 2, 1)).collect()
    recall = len(
        {(r["query_id"], r["neighbor_id"]) for r in part}
        & {(r["query_id"], r["neighbor_id"]) for r in exact}
    ) / len(exact)
    assert recall >= 0.4


def test_cosine_near_dup_pairs_planted(spark):
    # plant: 100/101 identical, 102 nearly identical, rest random
    rng = np.random.RandomState(7)
    base = rng.randn(64).astype(np.float32)
    rows = [(100, base.tolist(), 0), (101, base.tolist(), 0),
            (102, (base + rng.randn(64).astype(np.float32) * 0.01).tolist(), 0)]
    rows += [(200 + i, rng.randn(64).astype(np.float32).tolist(), 1) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in cosine_near_dup_pairs(df, threshold=0.98).collect()}
    assert (100, 101) in pairs and pairs[(100, 101)] >= 0.999999
    assert (100, 102) in pairs and (101, 102) in pairs
    assert all(a in (100, 101, 102) and b in (100, 101, 102) for a, b in pairs)


def test_semantic_dedup_twin_corpus(spark, emb):
    """SemDeDup contract on a twin-augmented corpus: every base vector
    survives (min-id keep rule), and a twin is dropped IFF it lands in its
    original's cluster. Twins that cross a cluster boundary (the +0.02 shift
    moves ~8% of this fixture's vectors to a different nearest centroid) are
    MISSED — that is the published trade-off of cluster-blocked dedup, pinned
    here so the miss class stays visible and bounded."""
    from timberjack_spark.operators.similarity import semantic_dedup

    base = emb.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    out = semantic_dedup(base.unionByName(pert), threshold=0.95).collect()
    n_base = base.count()
    assert len(out) == 2 * n_base
    by_id = {r["vec_id"]: r for r in out}
    n_missed = 0
    for vid in (r["vec_id"] for r in base.select("vec_id").collect()):
        assert by_id[vid]["keep"] is True
        same_cluster = by_id[vid]["cluster"] == by_id[vid + 10_000_000]["cluster"]
        # dropped exactly when blocked together (cos(v, v+.02) >= .987 always)
        assert by_id[vid + 10_000_000]["keep"] is (not same_cluster)
        n_missed += int(same_cluster is False)
    # boundary-crossing misses exist but stay a small tail
    assert 0 < n_missed < 0.15 * n_base


def test_semantic_dedup_no_dups_keeps_everything(spark, emb):
    """On the raw fixture (max pairwise cosine ~0.51) nothing is dropped."""
    from timberjack_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(emb, threshold=0.95)
    assert out.filter(~F.col("keep")).count() == 0
