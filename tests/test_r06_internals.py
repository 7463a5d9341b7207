"""Round-6 optimization internals: the rewrites must be value-identical to
the shapes they replaced. Each test pins one equivalence the optimization
relied on (see OPTIMIZATION_r06.md).
"""

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from timberjack_spark.functions.extract import ws_trim
from timberjack_spark.functions.patterns import WS_CLASS
from timberjack_spark.functions.text import make_repetition_counts_udf
from timberjack_spark.operators.similarity import (
    assign_nearest_centroid,
    cosine,
    cosine_prenorm,
    norm,
)

EDGE_TEXTS = [
    "plain words repeated words repeated words",
    "",                      # '' -> single ''-token (top_frac 1.0 contract)
    " \t \u00a0\u2028 ",   # whitespace-only, incl. NBSP/LS from the shared set
    None,                    # null text -> null counts (rules pass through)
    "one",                   # single token
    "a a a a a b",           # dominant token
    "tab\tsep\u00a0nbsp\u2029line",  # exotic WS separators from the shared class
]


def test_repetition_udf_matches_aggregation(spark):
    """The Arrow rep-counts UDF must reproduce the r5 explode + two-level
    aggregation EXACTLY (the quality_filter fracs divide these longs)."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(EDGE_TEXTS)]
    )
    t = F.col("text")
    agg = (
        df.select("doc_id", F.explode(F.split(ws_trim(t), WS_CLASS + "+")).alias("_tk"))
        .groupBy("doc_id", "_tk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.sum("_c").cast("long").alias("ntot"),
            F.count(F.lit(1)).alias("nd"),
            F.max("_c").alias("tc"),
        )
    )
    old = {r["doc_id"]: (r["ntot"], r["nd"], r["tc"]) for r in agg.collect()}
    rc = df.select("doc_id", make_repetition_counts_udf()(t).alias("rc")).collect()
    new = {r["doc_id"]: (r["rc"]["_ntot"], r["rc"]["_nd"], r["rc"]["_tc"]) for r in rc}
    for i, txt in enumerate(EDGE_TEXTS):
        if txt is None:
            # aggregation path: no row (explode of null); UDF: null counts —
            # both surface as NULL fracs downstream
            assert i not in old and new[i] == (None, None, None)
        else:
            assert new[i] == old[i], f"doc {i} ({txt!r}): {new[i]} != {old[i]}"


def test_cosine_prenorm_bit_identical(spark):
    """Factoring the norms into per-side columns must not change a single
    bit of the emitted cosine (same fold expressions over the same data)."""
    rows = [
        Row(a=[1.0, 2.0, 3.0], b=[-1.0, 0.5, 2.0]),
        Row(a=[0.1] * 8, b=[5.0] * 8),
        Row(a=[0.0, 0.0], b=[1.0, 2.0]),  # zero vector -> try_divide NULL
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        cosine(F.col("a"), F.col("b")).alias("plain"),
        cosine_prenorm(
            F.col("a"), F.col("b"), norm(F.col("a")), norm(F.col("b"))
        ).alias("pre"),
    ).collect()
    for r in out:
        if r["plain"] is None:
            assert r["pre"] is None
        else:
            # bit-level equality, not approx
            assert r["plain"].hex() == r["pre"].hex()


def test_assign_argmax_tiebreak(spark):
    """The min(struct(-cos, cluster)) aggregate must keep the old window
    semantics: highest rounded cos wins, ties break to the SMALLER cluster
    label, and the emitted cos survives the double negation exactly."""
    # two identical centroids (forced tie) + one orthogonal
    cents = spark.createDataFrame(
        [
            Row(label=2, centroid=[1.0, 0.0]),
            Row(label=1, centroid=[1.0, 0.0]),
            Row(label=3, centroid=[0.0, 1.0]),
        ]
    )
    vecs = spark.createDataFrame(
        [Row(vec_id=10, embedding=[2.0, 0.0]), Row(vec_id=11, embedding=[0.0, 3.0])]
    )
    got = {r["vec_id"]: r for r in assign_nearest_centroid(vecs, cents).collect()}
    assert got[10]["cluster"] == 1 and got[10]["cos"] == 1.0  # tie -> min label
    assert got[11]["cluster"] == 3 and got[11]["cos"] == 1.0
    assert isinstance(got[10]["cos"], float) and not np.signbit(got[10]["cos"])
