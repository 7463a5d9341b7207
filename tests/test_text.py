"""Text-analysis functions vs pure-Python oracles."""

import re

import pytest
from pyspark.sql import functions as F

from timberjack_spark.functions.text import (
    BASE,
    MOD,
    LANG_STOPWORDS,
    with_text_stats,
)

SAMPLES = [
    (0, "The quick brown fox and the lazy dog of the north"),
    (1, "el perro y el gato de la casa que corre por una calle"),
    (2, "der hund und die katze das ist nicht ein problem mit"),
    (3, "xyzzy plugh"),
    (4, ""),
    (5, "a b c d e f g h i j k l m n o p"),
    (6, "!!! ??? ... ;;; :::"),
]


def py_fingerprint(text: str) -> int:
    acc = 0
    for ch in text:
        acc = (acc * BASE + ord(ch)) % MOD
    return acc


def py_tokens(text: str) -> int:
    t = text.strip()
    return 0 if not t else len(re.split(r"\s+", t))


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    return {r["doc_id"]: r for r in with_text_stats(df).collect()}


def test_token_count(stats):
    for i, text in SAMPLES:
        assert stats[i]["n_tokens"] == py_tokens(text), (i, text)


def test_lang_id(stats):
    assert stats[0]["lang_guess"] == "en"
    assert stats[1]["lang_guess"] == "es"
    assert stats[2]["lang_guess"] == "de"
    assert stats[3]["lang_guess"] == "und"


def test_fingerprint_matches_python(stats):
    for i, text in SAMPLES:
        assert stats[i]["fingerprint"] == py_fingerprint(text), (i, text)


def test_punct_ratio_bounds(stats):
    assert stats[6]["punct_ratio"] > 0.7
    assert stats[0]["punct_ratio"] == 0.0
    for i, _ in SAMPLES:
        assert 0.0 <= stats[i]["quality"] <= 1.0


def test_ascii_codepoint_note(spark):
    # fingerprint uses F.ascii = codepoint of first char; pin non-ASCII behavior
    df = spark.createDataFrame([(0, "héllo")], "doc_id long, text string")
    r = with_text_stats(df).collect()[0]
    assert r["fingerprint"] == py_fingerprint("héllo")


def test_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = with_text_stats(docs)
    row = out.agg(
        F.min("n_tokens").alias("mn"), F.max("quality").alias("mq"),
        F.count_distinct("fingerprint").alias("nf"), F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["mn"] >= 1 and 0 < row["mq"] <= 1.0
    assert row["nf"] > row["n"] * 0.9  # fingerprints nearly unique on distinct docs


def test_quality_filter_rules(spark):
    from timberjack_spark.functions.text import quality_filter

    docs = [
        (0, "the cat sat on the mat and that is a fine place for a cat to sit"),  # clean
        (1, "short doc"),                                              # too_short (+low_stopword? 'short doc' 0 stopwords -> also low_stopword)
        (2, "!!!! ???? **** !!!! ???? **** the and of to in is that for"),  # high punct, stopwords fine, >=10 tokens
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # 10 tokens, no stopwords
        (4, " ".join(["word the"] * 2600)),                           # too_long (5200 tokens)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["reasons"], r["keep"]) for r in quality_filter(df).collect()}
    assert out[0] == ("", True)
    assert out[1] == ("too_short,low_stopword", False)   # rule order is fixed
    assert out[2][1] is False and "high_punct" in out[2][0]
    assert out[3] == ("low_stopword", False)
    assert out[4] == ("too_long", False)


def test_quality_filter_null_text(spark):
    """A null/missing document must NOT pass the gate by NULL-comparison
    fallthrough (ADVICE r04): explicit null_text rule, n_tokens coalesced."""
    from timberjack_spark.functions.text import quality_filter

    df = spark.createDataFrame([(0, None), (1, "the cat sat on the mat and that is a fine spot")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert out[0]["reasons"] == "null_text" and out[0]["keep"] is False
    assert out[0]["n_tokens"] == 0
    assert out[1]["keep"] is True
    # repetition variant: null text has no token rows -> NULL fracs -> the
    # repetition rules pass it through; null_text still drops it
    out2 = {r["doc_id"]: r for r in
            quality_filter(df, max_dup_frac=0.6, max_top_frac=0.2).collect()}
    assert out2[0]["reasons"] == "null_text" and out2[0]["keep"] is False


def test_quality_filter_repetition_rules(spark):
    """Gopher repetition gates (VERDICT r04 ask #7): dup_frac / top_frac from
    the d_doc_repetition aggregation become high_dup / top_token_dominance,
    appended after the base rules in fixed order."""
    from timberjack_spark.functions.text import quality_filter

    docs = [
        # 16 tokens, all distinct, stopwords present -> clean
        (0, "the cat sat on a mat and then it ran off to find some more food"),
        # 'spam' 12x + 4 stopword tokens: dup_frac 12/16=0.75>0.6, top 12/16>0.2
        (1, " ".join(["spam"] * 12) + " the of and in"),
        # top token 'the' 5/17 ~ 0.294 > 0.2 but dup_frac 5/17... careful:
        # distinct=13, dup=1-13/17~0.235<0.6 -> top_token_dominance only
        (2, "the the the the the cat sat mat ran dog fox hen owl bat rat cow pig"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["reasons"], r["keep"]) for r in
           quality_filter(df, max_dup_frac=0.6, max_top_frac=0.2).collect()}
    assert out[0] == ("", True)
    assert out[1] == ("high_dup,top_token_dominance", False)
    assert out[2] == ("top_token_dominance", False)
    # thresholds off -> pure projection, no repetition reasons
    base = {r["doc_id"]: r["reasons"] for r in quality_filter(df).collect()}
    assert base[1] == "" and base[2] == ""


def test_lang_id_udf_matches_expression(spark):
    """The Arrow lang-ID twin must equal the Catalyst expression exactly —
    including tie-breaks, '' / null, exotic whitespace and non-ASCII letters
    (the alphabet classes that caught real divergences in rounds 2-4)."""
    from timberjack_spark.functions.text import lang_id, make_lang_id_udf

    rows = [
        (0, "the cat and the hat is on the mat"),          # en
        (1, "el perro y la casa de los gatos"),            # es
        (2, "der hund und die katze ist nicht hier"),      # de
        (3, "le chat est dans la maison pour une heure"),  # fr
        (4, "zzz qqq www"),                                # und
        (5, ""),                                           # und
        (6, None),                                         # und (null scores)
        (7, "the el der le"),                              # 4-way tie -> larger code
        (8, "THE The thE"),                                # case folding
        (9, "the cat and \tthe\x0bhat"),        # exotic separators
        (10, "toß the é中 la el de"),                      # non-ASCII letters split
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    expr = {r["i"]: r["e"] for r in df.select("i", lang_id(F.col("text")).alias("e")).collect()}
    udf = {r["i"]: r["u"] for r in df.select("i", make_lang_id_udf()(F.col("text")).alias("u")).collect()}
    assert expr == udf
    assert expr[7] == "fr"  # tie-break: array_max takes the larger lang code
    assert expr[6] == "und" and expr[5] == "und"


def test_tfidf_top_terms_ranks_distinguishing_terms(spark):
    """tf/df ranking: a term unique to one doc beats a corpus-wide stopword;
    ranks are dense 1..k per doc; null/empty docs emit nothing."""
    from timberjack_spark.operators.keywords import tfidf_top_terms

    rows = [
        (1, "the zebra the quantum"),  # tf(the)=2, df=3 -> 2/3 < 1.0
        (2, "the cat dog"),  # cat/dog tie at 1.0 -> term-string tiebreak
        (3, "the apple apple apple"),
        (4, None),
        (5, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(d, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"]))
    assert set(by_doc) == {1, 2, 3}  # null/empty docs emit no rows
    for doc, terms in by_doc.items():
        assert [t[0] for t in sorted(terms)] == list(range(1, len(terms) + 1))
    # doc 1: zebra/quantum (df=1) outrank 'the' (df=3) despite tf('the')=3
    top1 = sorted(by_doc[1])
    assert {t[1] for t in top1} == {"quantum", "zebra"}
    # doc 3: apple tf=3 df=1 -> 3.0 beats the tf=1 df=3
    assert sorted(by_doc[3])[0][1] == "apple"
    # equal tf/df ratio ties break on term string: cat < dog, both 1.0
    assert [t[1] for t in sorted(by_doc[2])] == ["cat", "dog"]
    import pytest as _p
    with _p.raises(ValueError):
        tfidf_top_terms(d, k=0)


def test_length_histogram_buckets(spark):
    """Bucket b covers 2^(b-1)..2^b-1 tokens; empty/null docs land in
    bucket 0; boundaries at exact powers of two are exact (no libm log2)."""
    from timberjack_spark.functions.text import length_histogram

    rows = [
        (0, None),
        (1, ""),
        (2, "one"),                      # 1 token  -> bucket 1
        (3, "a b"),                      # 2 tokens -> bucket 2
        (4, "a b c"),                    # 3 tokens -> bucket 2
        (5, " ".join(["w"] * 4)),        # 4 tokens -> bucket 3
        (6, " ".join(["w"] * 7)),        # 7 tokens -> bucket 3
        (7, " ".join(["w"] * 8)),        # 8 tokens -> bucket 4
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in length_histogram(d).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0]["n_docs"] == 2 and out[0]["total_tokens"] == 0
    assert out[2]["n_docs"] == 2 and (out[2]["min_tokens"], out[2]["max_tokens"]) == (2, 3)
    assert out[3]["n_docs"] == 2 and (out[3]["min_tokens"], out[3]["max_tokens"]) == (4, 7)
    assert out[4]["n_docs"] == 1 and out[4]["total_tokens"] == 8


def test_inverted_index_postings_and_cap(spark):
    """Posting lists are sorted distinct doc ids; df counts the FULL set
    while postings carry only the first max_postings ids (the hot-term
    shard contract); repeats within a doc post once."""
    from timberjack_spark.operators.keywords import inverted_index

    rows = [
        (3, "zebra the the"),   # 'the' repeats in-doc -> one posting
        (1, "the apple"),
        (2, "the apple zebra"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["term"]: (r["df"], r["postings"]) for r in inverted_index(d).collect()}
    assert out["the"] == (3, "1,2,3")
    assert out["apple"] == (1, "1") or out["apple"] == (2, "1,2")
    assert out["apple"] == (2, "1,2")
    assert out["zebra"] == (2, "2,3")
    capped = {r["term"]: (r["df"], r["postings"]) for r in
              inverted_index(d, max_postings=2).collect()}
    assert capped["the"] == (3, "1,2")  # df full, postings capped to first 2
    import pytest as _p
    with _p.raises(ValueError):
        inverted_index(d, max_postings=0)
