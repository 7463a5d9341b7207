"""Per-document distinguishing-term extraction (TF-IDF top-k).

The keyword-extraction signal a curation pipeline uses for topic tagging,
cluster labeling, and near-duplicate triage: for each document, the k terms
with the highest term-frequency / document-frequency ratio. Stopwords rank
themselves out (df ~ corpus size), so no stopword list is needed.

Cross-engine determinism: the rank key is the SINGLE division tf/df — IEEE
division is correctly rounded, so Spark (Java) and the DuckDB oracle (C)
compute bit-identical doubles and therefore identical orderings. No logs, no
sums of floats (ln(N/df) idf would be libm-1-ulp territory); the monotone
transform doesn't change the top-k. Ties break on the term string. All output
columns are ints/strings.

Scale shape: explode -> (doc, term) partial-agg count (the dominant shuffle,
O(unique doc-term pairs)); document frequency is a second partial agg over
the tf table (already shuffled on (doc, term), so the term agg is cheap);
the vocabulary table joins back on term — left to the planner/AQE, which
broadcasts it while it fits and sort-merges beyond (a 100 TB corpus vocab
can exceed broadcast range); final per-doc top-k is a window over the tf
table, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import ws_trim
from ..plans import oracle as osql


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, term, tf, df, rank)`` — the top-``k`` terms per document by
    tf/df ratio (rank 1 = most distinguishing). Tokenization rides the shared
    contract (ws_trim + WS-class split; empty tokens dropped, so null/empty
    documents simply emit no rows)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(ws_trim(F.col(text_col)), osql.WS_CLASS_RE + "+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the df aggregation and the join probe side; the self-join
    # re-aliases one side's attributes, which defeats ReuseExchange's
    # canonical-plan match, so without a materialization Spark tokenizes the
    # corpus TWICE (verified: two FileScan+explode subtrees, no
    # ReusedExchange; 5.1 s -> 1.4 s at sf0.1 with the checkpoint). Same
    # pattern as the dedup candidate tables (dedup.py): lazy localCheckpoint,
    # materialized by the first action.
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def inverted_index(
    df: DataFrame,
    max_postings: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Search-index posting-list build: ``(term, df, postings)`` per distinct
    term, where ``df`` is the document frequency and ``postings`` the sorted
    doc-id list serialized as a comma-joined string (strings hash/compare
    portably; raw array columns do not survive a cross-engine value compare).

    Skew contract: stopword terms ('the') post in EVERY document, so an
    uncapped build sends a corpus-sized array through one reducer — the
    classic build-the-index skew bomb. ``postings`` therefore carries only
    the FIRST ``max_postings`` sorted ids (a real index shards hot posting
    lists the same way); ``df`` always counts the full set, so nothing about
    corpus statistics is lost and the cap is explicit in the schema, not
    silent. Scale shape: explode -> distinct (doc, term) -> the cap rides a
    row_number-over-(term order by id) filter, which Spark rewrites to a
    WindowGroupLimit BELOW the exchange (plan-pinned) — each map task ships
    at most ``max_postings`` ids per term, so the hot term's rows never
    concentrate, and the collect_list buffer is bounded by the cap. The full
    ``df`` count is a separate partial agg off the same checkpointed
    (term, id) table (two consumers — same ReuseExchange caveat as
    tfidf_top_terms).
    """
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1: {max_postings}")
    tok = (
        df.select(
            F.col(id_col),
            F.explode(F.split(ws_trim(F.col(text_col)), osql.WS_CLASS_RE + "+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select("term", F.col(id_col).alias("_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("term").orderBy("_id")
    posts = (
        tok.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_postings)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("_id")), lambda x: x.cast("string")),
                ",",
            ).alias("postings")
        )
    )
    dfreq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return dfreq.join(posts, "term").select("term", "df", "postings")
