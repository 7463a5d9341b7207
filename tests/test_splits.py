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


def test_quota_sample_deterministic_rates(spark):
    from timberjack_spark.operators.splits import quota_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    kept = quota_sample(docs, rates={"en": 0.5, "es": 0.25}, stratum_col="lang")
    k1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    k2 = {r["doc_id"] for r in quota_sample(
        docs, rates={"en": 0.5, "es": 0.25}, stratum_col="lang").select("doc_id").collect()}
    assert k1 == k2  # deterministic
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # rate-1.0 strata are kept completely; sampled strata land near their rate
    for lang, n in tot.items():
        if lang not in ("en", "es"):
            assert got.get(lang, 0) == n
    assert abs(got["en"] / tot["en"] - 0.5) < 0.15
    assert abs(got.get("es", 0) / tot["es"] - 0.25) < 0.15
    # rate 0 drops the stratum entirely; bad rates rejected
    none_en = quota_sample(docs, rates={"en": 0.0}, stratum_col="lang")
    assert none_en.filter(none_en.lang == "en").count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        quota_sample(docs, rates={"en": 1.5}, stratum_col="lang")


def test_pack_sequences_invariants(spark):
    """Packing contract: per-bin fill never exceeds the budget except for a
    single oversized doc alone in its bin; bin ids are contiguous from 0 per
    shard; docs pack in id order; assignment survives repartitioning."""
    from timberjack_spark.operators.splits import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 100, 30, 7, 200, 1, 64, 64, 64, 0])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=128, n_shards=2).collect()
    assert len(out) == len(rows)
    by_bin = {}
    for r in out:
        assert r["shard"] == r["doc_id"] % 2
        by_bin.setdefault((r["shard"], r["bin_idx"]), []).append((r["doc_id"], r["n_tokens"]))
    for (shard, b), members in by_bin.items():
        fill = sum(nt for _, nt in members)
        assert fill <= 128 or (len(members) == 1 and members[0][1] > 128)
    for shard in (0, 1):
        bins = sorted(b for s, b in by_bin if s == shard)
        assert bins == list(range(len(bins)))
        # id order respected: bin index is nondecreasing in doc_id
        ordered = sorted((r["doc_id"], r["bin_idx"]) for r in out if r["shard"] == shard)
        assert all(b1 <= b2 for (_, b1), (_, b2) in zip(ordered, ordered[1:]))
    # stability: a repartitioned input packs identically
    again = pack_sequences(df.repartition(7), budget=128, n_shards=2).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    from timberjack_spark.operators.splits import pack_sequences

    rows = [(0, " ".join(["w"] * 300)), (2, " ".join(["w"] * 10)), (4, " ".join(["w"] * 10))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["bin_idx"], r["n_tokens"]) for r in pack_sequences(df, budget=64, n_shards=2).collect()}
    assert out[0] == (0, 300)       # oversized: bin to itself
    assert out[2] == (1, 10)        # next doc opens a fresh bin
    assert out[4] == (1, 10)        # and shares it


def test_temperature_sample_semantics(spark):
    """alpha-temperature mixture: smallest domain fully kept, dominant ones
    cut to ~(n_min/n)^(1-alpha); alpha=1 is the natural mixture (no drops)."""
    import math

    from timberjack_spark.operators.splits import temperature_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = temperature_sample(docs, alpha=0.5).collect()
    assert len(out) == docs.count()  # one row per input doc
    n_by = {}
    kept_by = {}
    for r in out:
        n_by[r["source"]] = r["n_domain"]
        kept_by[r["source"]] = kept_by.get(r["source"], 0) + int(r["keep"])
    n_min = min(n_by.values())
    for s, n in n_by.items():
        expect = math.sqrt(n_min / n)
        if n == n_min:
            assert kept_by[s] == n  # rate exactly 1.0 -> no drops
        else:
            assert abs(kept_by[s] / n - expect) < 0.1
    # alpha=1: natural mixture, rate 1 everywhere
    all_kept = temperature_sample(docs, alpha=1.0)
    assert all_kept.filter("NOT keep").count() == 0
    # alpha=0: uniform target, every domain ~n_min kept in expectation
    uni = temperature_sample(docs, alpha=0.0)
    got0 = {r["source"]: r["n"] for r in
            uni.filter("keep").groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for s in n_by:
        assert abs(got0.get(s, 0) - n_min) / n_min < 0.35
    # deterministic re-run
    out2 = temperature_sample(docs, alpha=0.5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_sample(docs, alpha=1.5)


def test_chunk_documents_invariants(spark):
    """Every token lands in >= 1 chunk; consecutive chunks overlap by
    window-stride; rebuilding from stride-prefixes reproduces the doc;
    null/empty docs emit nothing."""
    import pytest

    from timberjack_spark.operators.chunks import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens: windows at 0,4,8
        (2, "a b c"),                               # shorter than one window
        (3, None),
        (4, "   "),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(d, window=6, stride=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    assert set(by_doc) == {1, 2}
    c1 = by_doc[1]
    assert sorted(c1) == [0, 1, 2]
    assert c1[0]["chunk_text"].split(" ") == [f"t{i}" for i in range(6)]
    assert c1[1]["chunk_text"].split(" ") == [f"t{i}" for i in range(4, 10)]
    assert c1[2]["chunk_text"].split(" ") == [f"t{i}" for i in range(8, 10)]  # short tail
    assert [c1[i]["n_tokens"] for i in (0, 1, 2)] == [6, 6, 2]
    # overlap contract: chunk i+1 starts stride tokens after chunk i -> doc
    # reconstructs from the first `stride` tokens of each chunk
    rebuilt = []
    for i in sorted(c1):
        rebuilt += c1[i]["chunk_text"].split(" ")[:4]
    assert rebuilt[:10] == [f"t{i}" for i in range(10)]
    assert by_doc[2][0]["chunk_text"] == "a b c" and by_doc[2][0]["n_tokens"] == 3
    with pytest.raises(ValueError):
        chunk_documents(d, window=0)


def test_chunk_documents_no_shuffle(spark):
    """Chunking is projection+explode only — a shuffle in this plan would be
    a bug (pure per-row function of the document)."""
    from tests.test_plans import plan_of
    from timberjack_spark.operators.chunks import chunk_documents

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(chunk_documents(d))
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_snapshot_diff_statuses(spark):
    """Full-outer release diff: added/removed/modified/unchanged from id
    presence + hash equality; null-text docs are never 'unchanged'."""
    from timberjack_spark.operators.versioning import snapshot_diff

    curr = spark.createDataFrame(
        [(1, "same"), (2, "new text"), (3, "brand new"), (5, None)],
        "doc_id long, text string",
    )
    prev = spark.createDataFrame(
        [(1, "same"), (2, "old text"), (4, "gone now"), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(curr, prev).collect()}
    assert out == {
        1: "unchanged",
        2: "modified",
        3: "added",
        4: "removed",
        5: "modified",  # null hashes never compare equal -> not provably unchanged
    }


def test_curation_pipeline_composition(spark):
    """The capstone query's flags must equal each stage run standalone, and
    admitted == keep_quality AND NOT is_dup AND NOT contaminated."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_cp", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in entry.queries()["d_curation_pipeline"](spark, sf).collect()}
    d = spark.read.parquet(f"{sf}/documents.parquet")
    assert len(out) == d.count()
    from pyspark.sql import functions as F

    from timberjack_spark.functions.text import quality_filter
    from timberjack_spark.operators.dedup import decontaminate_flags
    from timberjack_spark.operators.splits import split_assign

    q = {r["doc_id"]: r["keep"] for r in quality_filter(d).collect()}
    c = {r["doc_id"]: r["contaminated"] for r in
         decontaminate_flags(d, d.filter(F.col("doc_id") % 7 == 0), n=8).collect()}
    s = {r["doc_id"]: r["split"] for r in split_assign(d, salt="v1").collect()}
    for i, r in out.items():
        assert r["keep_quality"] == q[i]
        assert r["contaminated"] == c[i]
        assert r["split"] == s[i]
        assert r["admitted"] == (q[i] and not r["is_dup"] and not c[i])
    # eval-split docs share grams with themselves -> always contaminated
    assert all(out[i]["contaminated"] for i in out if i % 7 == 0)
