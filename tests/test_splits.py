"""Deterministic split assignment: stability is the contract under test."""

import pytest

from timberjack_spark.operators.splits import split_assign


def test_split_deterministic_and_stable_under_growth(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a1 = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    a2 = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert a1 == a2  # re-run identical
    # assignment is per-id: a SUBSET corpus assigns identically (the property
    # randomSplit / global row_number both lack — corpus growth must never
    # move an existing doc between splits)
    sub = docs.limit(20)
    a_sub = {r["doc_id"]: r["split"] for r in split_assign(sub).collect()}
    for k, v in a_sub.items():
        assert a1[k] == v
    # repartitioning never moves a doc either
    a_rep = {r["doc_id"]: r["split"] for r in split_assign(docs.repartition(7)).collect()}
    assert a_rep == a1


def test_split_proportions_and_salt(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == n  # complete + disjoint
    assert counts["train"] / n > 0.9  # 98% nominal, small-corpus tolerance
    # a new salt re-deals assignments
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, salt="v2").collect()}
    assert a != b
    # custom weights: remainder falls to the last split
    c = split_assign(docs, weights={"train": 0.5, "holdout": 0.25})
    got = {r["split"] for r in c.collect()}
    assert got <= {"train", "holdout"}
    with pytest.raises(ValueError):
        split_assign(docs, weights={"a": 0.9, "b": 0.2})
