"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship parse -> enrich -> route -> aggregate pipeline over
the sf0.001 driver tables; ``queries()``/``oracle_sql()`` expose each operator
from SURVEY.md §2 (plus the north-star routing/enrichment/ordering additions)
with a DuckDB oracle. Transcript-shaped inputs come from the deterministic
fixture generator (FIXTURES.md) — the same parquet file is read by both Spark
and DuckDB, so comparisons are bit-exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timberjack_spark.fixtures import dim_path, dim_role_df, dim_tool_df, transcripts_path
from timberjack_spark.functions.extract import with_parsed, ws_trim
from timberjack_spark.operators import aggregates as agg
from timberjack_spark.operators.analyze import LogQuery, matched
from timberjack_spark.operators.enrich import enrich
from timberjack_spark.operators.ordering import with_turn_order
from timberjack_spark.operators.route import sink_counts, with_category
from timberjack_spark.plans import oracle as osql

# shared whitespace regex class (Unicode White_Space literals — same string the
# engine's tokenizers use; see functions/patterns.py:WS_CLASS)
_WSC = osql.WS_CLASS_RE

# English stopword alternation for oracle twins of the stopword-ratio signal
from timberjack_spark.functions.text import LANG_STOPWORDS as _LS

_EN_IN_LIST = ",".join(f"'{w}'" for w in _LS["en"])
_WS_CHARS = _WSC[1:-1]  # the literal White_Space codepoints without brackets
# explicit-charset trim for the tokenizer twins: DuckDB's bare trim() strips an
# INCONSISTENT subset of Unicode spaces (NBSP/ideographic yes; tab/VT/U+2028
# no) while the engine trims the full shared White_Space set (ws_trim) —
# fuzz-found divergence on an NBSP-only document
_TRIMT = "trim(text, " + osql.WS_SQL + ")"

SF_DEFAULT = "/root/testdata/sf0.001"


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(transcripts_path(sf_dir))


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# entry — flagship pipeline on the driver's own sf0.001 tables
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lift `events` into the transcript shape, then parse -> enrich
    -> route -> aggregate per (category, level)."""
    ev = _tbl(spark, SF_DEFAULT, "events")
    level = (
        F.when(F.col("event_type") == "error", F.lit("ERROR"))
        .when(F.col("event_type") == "signup", F.lit("INFO"))
        .when(F.col("event_type") == "purchase", F.lit("DEBUG"))
        .otherwise(F.lit("WARN"))
    )
    text = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit(" ["), level, F.lit("] "),
        F.col("event_type"), F.lit(" value="), F.col("value").cast("string"),
        F.lit(" props="), F.col("props"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("role"),
        text.alias("text"),
        F.when(F.col("event_type") == "purchase", F.lit("db_query")).otherwise(F.lit("")).alias("tool"),
        F.col("ts"),
    )
    routed = with_category(with_parsed(tr))
    enriched = enrich(routed, dim_role_df(spark), dim_tool_df(spark))
    return (
        enriched.groupBy("category", "level", "role_group")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("category", "level", "role_group")
    )


# ---------------------------------------------------------------------------
# queries — one entry per implemented operator
# ---------------------------------------------------------------------------


def _q_total_count_error(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(pattern="ERROR"))
    return agg.total_count(m)


def _q_level_histogram(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery())
    return agg.level_histogram(m)


def _q_trend_histogram(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery())
    return agg.time_trends(m)


def _q_error_types(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery())
    return agg.error_types(m)


def _q_top_errors(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery())
    return agg.top_errors(m, 5)


def _q_message_stats(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery())
    s = agg.message_stats(m)
    return s.select("cnt", "unique_cnt", F.round("repetition_ratio", 6).alias("repetition_ratio"))


def _q_unique_messages(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(pattern="Cache"))
    return agg.unique_messages(m)


def _q_level_filter(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(level="ERROR"))
    return agg.total_count(m)


def _q_pattern_regex(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(pattern="user_[0-9]+"))
    return agg.total_count(m)


def _q_field_filter_service(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(field_filters={"service": "api"}))
    return agg.total_count(m)


def _q_field_filter_nested(spark, sf_dir):
    m = matched(_transcripts(spark, sf_dir), LogQuery(field_filters={"user.role": "admin"}))
    return agg.total_count(m)


def _q_line_counts(spark, sf_dir):
    """A2 — per-distinct-line occurrence counts over the matched set
    (reference 'line [xN]' dedup display, src/analyzer.rs:317-324)."""
    m = matched(_transcripts(spark, sf_dir), LogQuery(pattern="Cache"))
    return agg.line_counts(m)


def _q_matched_sample(spark, sf_dir):
    """A3 — bounded distinct-line sample (MAX_STORED_LINES cap,
    src/formatter.rs:167-185), canonical deterministic order."""
    m = matched(_transcripts(spark, sf_dir), LogQuery(pattern="ERROR"))
    return agg.matched_sample(m, limit=50)


def _q_field_coverage(spark, sf_dir):
    """Schema-on-read JSON field profiling: per dotted path, presence count,
    exact distinct values, and coverage fraction of parsed JSON rows — the
    schema-drift/sparsity report. JVM is_jsonish gate before the Arrow UDF;
    maps checkpointed once (two plan branches); coverage is one IEEE
    division (bit-identical in DuckDB)."""
    from timberjack_spark.functions.fields import field_coverage

    return field_coverage(_transcripts(spark, sf_dir))


def _q_field_histogram(spark, sf_dir):
    """P3 — materialized dotted-path fields map (json.rs:50-90): which JSON
    field paths occur, and in how many rows."""
    from timberjack_spark.functions.fields import field_name_histogram

    return field_name_histogram(_transcripts(spark, sf_dir))


def _q_route_sink_counts(spark, sf_dir):
    df = with_category(with_parsed(_transcripts(spark, sf_dir)))
    return sink_counts(df)


def _q_enrich_rollup(spark, sf_dir):
    df = with_category(with_parsed(_transcripts(spark, sf_dir)))
    e = enrich(df, dim_role_df(spark), dim_tool_df(spark))
    return (
        e.groupBy("category", "role_group", "tool_family")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("category", "role_group", "tool_family")
    )


def _q_turn_ordering(spark, sf_dir):
    df = _transcripts(spark, sf_dir).filter(F.col("conv_id") == "conv-000000")
    return with_turn_order(df).select("conv_id", "turn_idx", "turn_rank")


def _q_conv_stats(spark, sf_dir):
    df = _transcripts(spark, sf_dir)
    return (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("tool") != "", 1).otherwise(0)).alias("n_tool_turns"),
            F.count_distinct(F.col("role")).alias("n_roles"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def _q_hourly_level_matrix(spark, sf_dir):
    df = with_parsed(_transcripts(spark, sf_dir))
    return (
        df.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("level"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _q_lineitem_pricing(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def _q_top_customers(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    return (
        rev.join(F.broadcast(c), rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def _q_events_hourly(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def _q_events_sessions(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return (
        marked.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def _q_top3_parts_per_brand(spark, sf_dir):
    """Per-group top-k via ranked window (partitioned — no global-window hazard)."""
    p = _tbl(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "rnk", "p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


def _q_orders_rollup(spark, sf_dir):
    """ROLLUP over (status, priority): super-aggregate rows with NULL keys."""
    o = _tbl(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def _q_lineitem_running(spark, sf_dir):
    """Per-supplier running quantity by ship date (deterministic total order)."""
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 20)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


def _q_mktsegment_pivot(spark, sf_dir):
    """Pivot: order counts per customer market segment x order status."""
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "c_mktsegment",
            F.col("F").alias("cnt_f"),
            F.col("O").alias("cnt_o"),
            F.col("P").alias("cnt_p"),
        )
    )


def _q_session_windows(spark, sf_dir):
    """Spark-native session windows (F.session_window, 30-min gap): merges
    events closer than the gap, new session at diff >= gap. Same operator
    family as q_events_sessions (lag-based) but through the built-in API the
    streaming flavor shares; oracle is classic gaps-and-islands SQL with the
    matching >= boundary. Shares its aggregation program with the streaming
    drain (s_stream_session_windows) — one logic, two execution modes."""
    from timberjack_spark.streaming.pipeline import session_windows_agg

    return session_windows_agg(_tbl(spark, sf_dir, "events"))


def _q_events_quantiles(spark, sf_dir):
    """Exact distribution summary per event type (percentile with linear
    interpolation — same estimator as DuckDB quantile_cont, so the oracle is
    exact). At 100 TB you would swap percentile_approx (t-digest sketch,
    mergeable partial aggregation) — same plan shape, bounded memory."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", F.lit(p)), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.95)
        ],
        F.count(F.lit(1)).alias("cnt"),
    )


def _q_events_asof_click(spark, sf_dir):
    """As-of join (custom temporal operator — union + running-last, one
    shuffle): for each error event, the latest click of the same user at or
    before it."""
    from timberjack_spark.operators.temporal import asof_join

    ev = _tbl(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        err, clicks, ["user_id"], "ts", "ts",
        payload_cols=["event_id", "ts", "value"], tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("click_id"),
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


def _q_events_range_ctx(spark, sf_dir):
    """Range join (custom temporal operator — time-bin blocking equi-join):
    per error event, how many events the same user produced in the previous
    30 minutes."""
    from timberjack_spark.operators.temporal import range_join_count

    ev = _tbl(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    return range_join_count(
        err, ev, ["user_id"], "ts", "ts", lower_sec=-1800, upper_sec=0,
        count_alias="n_prior_30m",
    ).select("event_id", "user_id", "n_prior_30m")


def _q_doc_dedup_stats(spark, sf_dir):
    d = _tbl(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5(F.col("text"))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5(F.col("text")))).alias("n_dup_docs"),
    )


def _q_doc_token_stats(spark, sf_dir):
    d = _tbl(spark, sf_dir, "documents")
    toks = F.split(ws_trim(F.col("text")), osql.WS_CLASS_RE + "+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        # split-on-non-word + exact match, not \b: Java \b is Unicode-aware,
        # RE2's is ASCII — word-boundary regexes are outside the portable
        # subset (see text.stopword_count)
        F.size(
            F.filter(
                F.split(F.col("text"), r"[^A-Za-z0-9_]+"),
                lambda t: t.isin("the", "a", "of", "and", "in"),
            )
        ).alias("n_stopwords"),
    )


def _q_level_histogram_grok(spark, sf_dir):
    """Same aggregation as t_level_histogram but through the Arrow pandas-UDF
    grok stage — the oracle doubles as a correctness check of the UDF path."""
    m = matched(_transcripts(spark, sf_dir), LogQuery(use_pandas_grok=True))
    return agg.level_histogram(m)


def _q_salted_conv_counts(spark, sf_dir):
    from timberjack_spark.operators.ordering import salted_count_by

    return salted_count_by(_transcripts(spark, sf_dir), "conv_id")


def _q_text_stats(spark, sf_dir):
    from timberjack_spark.functions.text import with_text_stats

    d = _tbl(spark, sf_dir, "documents")
    return with_text_stats(d).select(
        "doc_id", "n_tokens", "n_chars", "punct_ratio", "stopword_ratio", "quality", "lang_guess"
    )


def _q_doc_fingerprint(spark, sf_dir):
    from timberjack_spark.functions.text import fingerprint

    d = _tbl(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _q_redacted_lines(spark, sf_dir):
    """PII scrubbing (training-data curation): redact email/IP/user-id tokens
    and group the redacted templates — redaction collapses near-unique raw
    lines into countable templates. Pure JVM regexp_replace chain."""
    from timberjack_spark.functions.text import REDACTION_PATTERNS, redact_pii, redaction_count

    t = _transcripts(spark, sf_dir)
    # gate with ONE alternation rlike, then count/redact survivors only:
    # n_red > 0 iff some pattern matches, so the single find-first regex is
    # an exact filter — the previous count-then-filter shape ran all three
    # regexp_counts over the whole corpus TWICE (predicate pushdown inlines
    # the counts into the Filter below the Project), vs one early-exit scan
    # here; counts + replace chain run only on the ~15% of matching rows
    combined = "|".join(f"(?:{p})" for p, _ in REDACTION_PATTERNS)
    r = t.filter(F.col("text").rlike(combined)).select(
        "text", redaction_count(F.col("text")).alias("n_red")
    )
    return (
        r.select(redact_pii(F.col("text")).alias("line"), "n_red")
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_red").alias("n_redactions"))
    )


def _q_doc_repetition(spark, sf_dir):
    """Gopher/C4-style repetition signals per document: duplicate-token
    fraction and top-token dominance. Two-level hash aggregation — both
    levels partial-aggregate map-side, keys are (doc, token) then doc, so
    the shuffle never skews at corpus scale."""
    d = _tbl(spark, sf_dir, "documents")
    c = (
        d.select("doc_id", F.explode(F.split(ws_trim(F.col("text")), osql.WS_CLASS_RE + "+")).alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_cnt"),
    )
    return a.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.lit(1) - F.col("n_distinct") / F.col("n_tokens"), 6).alias("dup_frac"),
        F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias("top_frac"),
    )


def _q_top_terms(spark, sf_dir):
    """Corpus vocabulary head: global token counts, top 50 with deterministic
    rank. The global window runs over the AGGREGATED vocabulary histogram
    (thousands of rows), not the corpus — at 100 TB this is the standard
    build-the-tokenizer-vocab job (explode + partial-agg count + small sort)."""
    d = _tbl(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split(ws_trim(F.col("text")), osql.WS_CLASS_RE + "+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return cnt.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 50)


def _q_exact_dedup(spark, sf_dir):
    from timberjack_spark.operators.dedup import exact_dedup

    d = _tbl(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id")


def _q_jaccard_pairs(spark, sf_dir):
    from timberjack_spark.operators.dedup import ngram_jaccard_pairs

    # capped at 500 docs: intra-block pairwise is quadratic by design (the
    # blocked-exact regime); larger corpora use d_minhash_pairs instead
    d = _tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return ngram_jaccard_pairs(d, block_cols=["lang"], threshold=0.12)


def _q_quality_filter(spark, sf_dir):
    """C4/Gopher-style keep-drop gate with audit reasons — one pure-projection
    scan composing the row-local text signals; reasons string is rule-ordered
    and '' means keep. The last stage of the curation chain (dedup ->
    decontaminate -> quality filter)."""
    from timberjack_spark.functions.text import quality_filter

    return quality_filter(_tbl(spark, sf_dir, "documents"))


def _q_quality_filter_v2(spark, sf_dir):
    """Quality gate with the Gopher repetition rules armed: the two read-only
    d_doc_repetition signals (duplicate-token fraction, top-token dominance)
    become actionable drop rules high_dup / top_token_dominance, appended
    after the base C4 rules in the same rule-ordered reasons contract.
    Adds one two-level token aggregation + a co-partitioned doc_id join to
    the base projection — the full curation keep/drop gate a pipeline runs."""
    from timberjack_spark.functions.text import quality_filter

    return quality_filter(
        _tbl(spark, sf_dir, "documents"), max_dup_frac=0.6, max_top_frac=0.2
    )


def _q_contam_flags(spark, sf_dir):
    """Benchmark decontamination: training docs flagged when any word 8-gram
    also appears in the eval split (doc_id % 7 == 0 stands in for a held-out
    benchmark suite). Exact n-gram hash semi-join — the eval gram set
    broadcasts (benchmarks are tiny next to a training corpus), the training
    side is one scan; output covers every training doc with hit count + flag
    so the downstream keep/drop filter consumes it directly."""
    from timberjack_spark.operators.dedup import decontaminate_flags

    d = _tbl(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 7 == 0)
    tr = d.filter(F.col("doc_id") % 7 != 0)
    return decontaminate_flags(tr, ev, n=8)


def _q_minhash_pairs(spark, sf_dir):
    from timberjack_spark.operators.dedup import minhash_near_dups

    d = _tbl(spark, sf_dir, "documents")
    # bands=32 (r=2): the LSH S-curve at s=0.5 gives recall ~1-(1-0.25)^32 —
    # verified equal to the exact all-pairs oracle at sf0.01 (25/25 pairs)
    # explicit hot-bucket cap (library default is None = guaranteed recall;
    # the scale entrypoint opts in — recall at this cap is pinned == exact
    # all-pairs by tests/test_oracle_recall.py)
    return minhash_near_dups(d, threshold=0.5, bands=32, max_bucket_size=10_000)


def _q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup clustering (connected components over the minhash
    pair graph): every doc labeled with min-id of its cluster, singletons
    included — the keep-one-representative decision (`doc_id == cluster_id`)
    a C4/RefinedWeb-style dedup pipeline executes after pairwise detection.
    Iterative min-label propagation + pointer jumping on the pair-endpoint
    subgraph only; oracle is the exact all-pairs graph's transitive closure
    via a recursive CTE (engine pair recall == exact is pinned separately)."""
    from timberjack_spark.operators.dedup import near_dup_clusters

    d = _tbl(spark, sf_dir, "documents")
    return near_dup_clusters(d, threshold=0.5, bands=32, max_bucket_size=10_000)


def _q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (98/1/1): md5(salt:id) hash
    bucket, a pure per-doc function — stable under corpus growth,
    repartitioning and re-runs (unlike randomSplit / global row_number),
    which is what keeps a frozen eval split frozen across dataset releases.
    One projection, no shuffle; the oracle recomputes the exact assignment
    (md5 + integer mod are in the portable cross-engine subset)."""
    from timberjack_spark.operators.splits import split_assign

    return split_assign(_tbl(spark, sf_dir, "documents"), salt="v1")


def _q_quota_sample(spark, sf_dir):
    """Deterministic per-language quota downsampling (en x0.5, es x0.25,
    rest kept): the mixture-rebalancing step that hits a target source/
    language distribution. Same hash-bucket stability contract as
    d_split_assign; rates ride a literal map — projection+filter, one scan,
    no join, no shuffle."""
    from timberjack_spark.operators.splits import quota_sample

    d = _tbl(spark, sf_dir, "documents")
    return quota_sample(d, rates={"en": 0.5, "es": 0.25}, stratum_col="lang").select(
        "doc_id", "lang"
    )


def _q_temperature_sample(spark, sf_dir):
    """Temperature-flattened domain mixture (alpha=0.5): keep rate
    (n_min/n_d)^0.5 per source — downsample dominant sources toward a flatter
    mixture without upsampling. The closed form cancels the cross-domain
    normalizer, so the rate is pure sqrt/divide (correctly-rounded IEEE ops)
    and the DuckDB oracle reproduces it bit-exactly. Plan: tiny domain-count
    agg broadcast-joined back onto the corpus scan."""
    from timberjack_spark.operators.splits import temperature_sample

    return temperature_sample(_tbl(spark, sf_dir, "documents"), alpha=0.5, salt="mix-v1")


def _q_tfidf_topk(spark, sf_dir):
    """Top-3 distinguishing terms per document by tf/df ratio (stopwords rank
    themselves out). The rank key is ONE IEEE division — bit-identical in
    Spark and DuckDB, so the ordering (and hash) matches exactly; ties break
    on the term string. Window runs over the (doc, term) tf table, never the
    corpus."""
    from timberjack_spark.operators.keywords import tfidf_top_terms

    return tfidf_top_terms(_tbl(spark, sf_dir, "documents"), k=3)


def _q_snapshot_diff(spark, sf_dir):
    """Release-to-release corpus diff: previous release synthesized
    deterministically from the current one (doc_id % 11 == 0 dropped ->
    'added' now; doc_id % 13 == 0 text-perturbed -> 'modified'). One
    full-outer join on id comparing md5 hashes — 24 bytes/row through the
    shuffle, zero-exchange on bucketed release tables."""
    from timberjack_spark.operators.versioning import snapshot_diff

    d = _tbl(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [v1]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(d, prev)


def _q_length_histogram(spark, sf_dir):
    """Power-of-two sequence-length histogram — the packing/truncation
    planning stat. Bucket = length(bin(n_tokens)): integer/string built-ins
    reproduce exactly cross-engine where floor(log2(n)) would not. One scan,
    ~20-group agg."""
    from timberjack_spark.functions.text import length_histogram

    return length_histogram(_tbl(spark, sf_dir, "documents"))


def _q_contam_report(spark, sf_dir):
    """Per-eval-doc contamination report (inverse of d_contam_flags): for
    each benchmark document, distinct 8-grams found in training + distinct
    training docs sharing one. Eval grams broadcast; the training corpus is
    one scan; the join output is only the overlap volume."""
    from timberjack_spark.operators.dedup import contamination_report

    d = _tbl(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 7 == 0)
    tr = d.filter(F.col("doc_id") % 7 != 0)
    return contamination_report(tr, ev, n=8)


def _q_curation_pipeline(spark, sf_dir):
    """Capstone composition: the FULL curation pass — quality gate, exact
    dedup (min-id representative), benchmark decontamination (vs the
    doc_id % 7 eval split) and deterministic split assignment — as ONE
    declarative Spark plan per document: (doc_id, keep_quality, is_dup,
    contaminated, split, admitted). Catalyst fuses the three projections
    into the dedup/decontam scans; shuffles are the md5 group and the gram
    aggregation only, both partial-aggregated; eval grams broadcast. This
    is the whole-pipeline query a user of the reference would run."""
    from timberjack_spark.functions.text import quality_filter
    from timberjack_spark.operators.dedup import decontaminate_flags
    from timberjack_spark.operators.splits import split_expr

    d = _tbl(spark, sf_dir, "documents")
    # quality signals + content hash fused into ONE scan (keep_cols
    # passthrough), and is_dup decided by a window over the md5 partition —
    # one shuffle on the content hash instead of the r5 groupBy + join-back
    # (two shuffles + an extra join). The isNotNull filter mirrors the
    # oracle's JOIN ON md5(text) semantics (a null text never matches), so
    # the output row set is unchanged on any input.
    q = quality_filter(d.withColumn("_h", F.md5("text")), keep_cols=("_h",)).select(
        "doc_id", F.col("keep").alias("keep_quality"), "_h"
    )
    qd = (
        q.filter(F.col("_h").isNotNull())
        .withColumn(
            "is_dup", F.col("doc_id") != F.min("doc_id").over(Window.partitionBy("_h"))
        )
        .drop("_h")
    )
    ev = d.filter(F.col("doc_id") % 7 == 0)
    contam = decontaminate_flags(d, ev, n=8).select("doc_id", "contaminated")
    out = (
        qd.join(contam, "doc_id")
        .withColumn("split", split_expr(F.col("doc_id"), "v1", None))
        .withColumn(
            "admitted",
            F.col("keep_quality") & ~F.col("is_dup") & ~F.col("contaminated"),
        )
    )
    return out.select(
        "doc_id", "keep_quality", "is_dup", "contaminated", "split", "admitted"
    )


def _q_inverted_index(spark, sf_dir):
    """Search-index posting-list build: per term, document frequency + the
    first 1000 sorted doc ids as a comma-joined string. The cap rides a
    row_number filter Spark rewrites to a map-side WindowGroupLimit, so hot
    stopword terms never concentrate rows; df counts the full set."""
    from timberjack_spark.operators.keywords import inverted_index

    return inverted_index(_tbl(spark, sf_dir, "documents"), max_postings=1000)


def _q_chunk_docs(spark, sf_dir):
    """RAG-style sliding-window chunking: 64-token windows every 48 tokens
    (16-token overlap), stable (doc_id, chunk_idx) identity. Tokenize +
    slice + posexplode are all JVM built-ins over ONE scan — no shuffle
    anywhere in the plan."""
    from timberjack_spark.operators.chunks import chunk_documents

    return chunk_documents(_tbl(spark, sf_dir, "documents"), window=64, stride=48)


def _q_dataset_card(spark, sf_dir):
    """Per-(split, language) dataset statistics card: the release-report
    rollup composing the deterministic split assignment and the quality gate
    in ONE corpus scan (both are pure projections; quality_filter's keep_cols
    passthrough avoids a doc_id join back). Only shuffle = the tiny
    (split, lang) aggregation."""
    from timberjack_spark.operators.splits import dataset_card

    return dataset_card(_tbl(spark, sf_dir, "documents"), salt="v1")


def _q_seq_packing(spark, sf_dir):
    """Greedy token-budget sequence packing ("sample packing"): documents go
    to fixed 128-token bins, packed per deterministic shard (doc_id % 8) in
    id order so shards parallelize while the assignment stays a pure function
    of the corpus. Oracle = a DuckDB recursive CTE replaying the identical
    greedy pass per shard."""
    from timberjack_spark.operators.splits import pack_sequences

    return pack_sequences(_tbl(spark, sf_dir, "documents"), budget=128, n_shards=8)


def _q_simhash_pairs(spark, sf_dir):
    from timberjack_spark.operators.dedup import exact_jaccard_verify, simhash_near_dups

    d = _tbl(spark, sf_dir, "documents")
    # simhash blocks generate candidates; the exact shingle-Jaccard verify
    # makes the output oracle-computable. 3-gram features keep signatures of
    # unrelated template-generated docs decorrelated (token-level signatures
    # cluster and flood the blocking buckets); max_hamming=9 covers every
    # jaccard>=0.5 pair (measured max 3-gram-signature hamming among the 25
    # true pairs at sf0.01 is 9; verified == exact all-pairs)
    cand = simhash_near_dups(
        d, max_hamming=9, n=3, max_bucket_size=10_000  # explicit opt-in cap
    ).select("id_a", "id_b")
    return exact_jaccard_verify(d, cand, threshold=0.5)


def _q_brute_topk(spark, sf_dir):
    from timberjack_spark.operators.similarity import brute_force_topk

    e = _tbl(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=3)


def _q_lsh_topk(spark, sf_dir):
    from timberjack_spark.operators.similarity import lsh_topk

    e = _tbl(spark, sf_dir, "embeddings")
    # (24 tables x 3 bits): enough OR-amplification that the candidate set
    # provably contains the true top-3 at sf0.01 (verified == brute force), so
    # the exact-top-k SQL is a valid oracle; at corpus scale the same config
    # still prunes each table's bucket to ~corpus/8
    return lsh_topk(e, e.filter(F.col("vec_id") < 5), k=3, n_tables=24, bits_per_table=3)


def _q_label_centroids(spark, sf_dir):
    from timberjack_spark.operators.similarity import label_centroids

    e = _tbl(spark, sf_dir, "embeddings")
    return (
        label_centroids(e)
        .select("label", F.posexplode("centroid").alias("pos", "v"))
        .select("label", "pos", F.round("v", 5).alias("centroid_val"))
    )


def _q_centroid_assign(spark, sf_dir):
    from timberjack_spark.operators.similarity import assign_nearest_centroid, label_centroids

    e = _tbl(spark, sf_dir, "embeddings")
    return assign_nearest_centroid(e, label_centroids(e))


def _q_ivf_topk(spark, sf_dir):
    from timberjack_spark.operators.similarity import ivf_topk

    e = _tbl(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 5), k=3, n_probe=3)


def _q_cosine_pairs(spark, sf_dir):
    """Embedding cosine near-dup pairs (the one dedup/ANN operator round 2
    left without driver adjudication). The fixture embeddings have no real
    near-dups (max pairwise cosine 0.51), so the corpus is augmented with a
    deterministic perturbed twin per vector (+0.02 per component, double
    math in both engines): 500 true pairs with cosine >= 0.987117, worst
    false pair 0.537 — threshold 0.95 separates with margin. LSH at 16
    tables x 10 bits: worst-pair bit-agreement 0.949 => per-pair miss
    probability ~6e-7 (recall pinned by tests/test_oracle_recall.py)."""
    from timberjack_spark.operators.similarity import cosine_near_dup_pairs

    e = _tbl(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    aug = base.unionByName(pert)
    return cosine_near_dup_pairs(
        aug, threshold=0.95, n_tables=16, bits_per_table=10, max_bucket_size=10_000
    )


def _q_span_dedup(spark, sf_dir):
    """C4-style cross-corpus span dedup: 13-token consecutive chunks, keep
    each distinct span's first (doc_id, span_idx) occurrence, rebuild docs
    from survivors. Exact-duplicate fixture docs lose every span to their
    first copy (clean_text = ''); near-duplicates keep only novel tails."""
    from timberjack_spark.operators.dedup import span_dedup

    return span_dedup(_tbl(spark, sf_dir, "documents"), w=13)


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic deduplication over the (twin-augmented) embedding
    corpus: label-centroid clusters block the pair search, min-id keep rule.
    Same deterministic +0.02 perturbed-twin augmentation as e_cosine_pairs
    (the raw fixture has no near-dups) with the label carried onto the twin.
    Every base id survives; a twin is dropped iff it lands in its original's
    cluster — the ~8% of twins whose +0.02 shift crosses a centroid boundary
    are MISSED, the published trade-off of cluster-blocked semantic dedup
    (the oracle reproduces the same block structure, so parity is exact;
    tests/test_similarity.py pins the miss class and bounds its size)."""
    from timberjack_spark.operators.similarity import semantic_dedup

    e = _tbl(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    return semantic_dedup(base.unionByName(pert), threshold=0.95)


def _q_bpe_tokens(spark, sf_dir):
    from timberjack_spark.functions.text import bpe_ish_token_count

    d = _tbl(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))


def _q_media_features(spark, sf_dir):
    from timberjack_spark.operators.multimodal import extract_features, synthesize_media

    d = _tbl(spark, sf_dir, "documents")
    return extract_features(synthesize_media(d)).select("media_id", "kind", "n_bytes", "sha256")


def _q_audio_features(spark, sf_dir):
    """REAL audio decode: synthesize genuine PCM16 WAV containers, parse them
    with the stdlib wave module, measure with numpy DSP — the oracle knows the
    expected values closed-form from the id, so the decoder must actually work
    to match it."""
    from timberjack_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_audio_media,
    )

    d = _tbl(spark, sf_dir, "documents")
    return extract_audio_features(synthesize_audio_media(d)).select(
        "media_id", "sr", "n_samples", "duration_ms", "dom_freq_hz"
    )


def _q_video_features(spark, sf_dir):
    """REAL video decode: genuine YUV4MPEG2 containers (the one mainstream
    codec-free video container — ASCII header + FRAME-delimited raw C444
    planes) demuxed and decoded with pure numpy. The oracle knows width,
    height, frame count, plane means and inter-frame motion closed-form from
    the id, so the demuxer must actually walk the container to match."""
    from timberjack_spark.operators.multimodal import (
        extract_video_features,
        synthesize_video_media,
    )

    d = _tbl(spark, sf_dir, "documents")
    return extract_video_features(synthesize_video_media(d))


def _q_image_features(spark, sf_dir):
    """REAL image decode: binary P6 PPM payloads parsed with pure numpy."""
    from timberjack_spark.operators.multimodal import (
        extract_image_features,
        synthesize_image_media,
    )

    d = _tbl(spark, sf_dir, "documents")
    return extract_image_features(synthesize_image_media(d)).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


_STREAM_SEQ = [0]


def _q_stream_level_counts(spark, sf_dir):
    """Structured-Streaming drain of the windowed level histogram — verified
    against the BATCH oracle SQL (stream==batch is the engine's contract)."""
    from timberjack_spark.fixtures import transcripts_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_once

    _STREAM_SEQ[0] += 1
    return run_stream_once(
        spark, transcripts_stream_dir(sf_dir), query_name=f"q_stream_lv_{_STREAM_SEQ[0]}"
    )


def _q_stream_conv_sessions(spark, sf_dir):
    """applyInPandasWithState conversation stats, drained and reduced to final
    state per conversation — oracle is plain batch SQL."""
    from timberjack_spark.fixtures import transcripts_stream_dir
    from timberjack_spark.streaming.pipeline import run_session_stats_once

    _STREAM_SEQ[0] += 1
    out = run_session_stats_once(
        spark,
        transcripts_stream_dir(sf_dir),
        query_name=f"q_stream_sess_{_STREAM_SEQ[0]}",
        # one state-store instance per core (the cluster-scale sizing the
        # pipeline docstring prescribes); measured 5.3 -> 4.8 s at sf0.1 vs
        # the drain default 16 — this stage's wall is per-group python time,
        # which parallelizes with state partitions
        state_partitions=spark.sparkContext.defaultParallelism,
    )
    return out.groupBy("conv_id").agg(
        F.max("n_turns").alias("n_turns"),
        F.max("n_errors").alias("n_errors"),
        F.max("last_turn_idx").alias("last_turn_idx"),
    )


def _q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicates drain): each distinct parsed
    message template emitted exactly once; oracle is batch SELECT DISTINCT —
    the stream==batch contract for the dedup stage."""
    from timberjack_spark.fixtures import transcripts_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_dedup_once

    _STREAM_SEQ[0] += 1
    return run_stream_dedup_once(
        spark, transcripts_stream_dir(sf_dir), query_name=f"q_stream_dd_{_STREAM_SEQ[0]}"
    )


def _q_stream_session_windows(spark, sf_dir):
    """Streaming drain of the session-window aggregation (F.session_window
    under availableNow, complete mode) over the events file-stream — verified
    against the same gaps-and-islands batch SQL as q_session_windows, so all
    four streaming stages share the stream==batch contract. The events table
    streams in as 4 time-ordered files so sessions genuinely merge across
    micro-batches."""
    from timberjack_spark.fixtures import events_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_session_windows_once

    _STREAM_SEQ[0] += 1
    return run_stream_session_windows_once(
        spark, events_stream_dir(sf_dir), query_name=f"q_stream_sw_{_STREAM_SEQ[0]}"
    )


def _q_stream_decontam(spark, sf_dir):
    """Streaming decontamination: documents stream in (4-file drain) and each
    id sharing any word 8-gram with the STATIC eval split (doc_id % 7 == 0)
    is emitted exactly once — the batch d_contam_flags semi-join under the
    streaming engine (stream-static broadcast join + dropDuplicates state).
    Oracle: the batch contamination SQL restricted to contaminated ids."""
    from timberjack_spark.fixtures import documents_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_decontam_once

    ev = _tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    _STREAM_SEQ[0] += 1
    out = run_stream_decontam_once(
        spark,
        documents_stream_dir(sf_dir),
        ev,
        query_name=f"q_stream_dc_{_STREAM_SEQ[0]}",
    )
    # the stream carries the whole corpus incl. the eval split; restrict to
    # TRAINING docs to match the batch operator's output domain
    return out.filter(F.col("doc_id") % 7 != 0)


def _q_stream_ingest_dedup(spark, sf_dir):
    """Streaming ingestion novelty filter (7th streaming stage): every
    arriving doc whose exact text (md5) is absent from the STATIC history
    split (doc_id % 5 == 0) is admitted. Stateless stream-static left-anti
    join against a once-materialized broadcast hash set — no watermark, no
    state store. Oracle: the batch anti-join."""
    from timberjack_spark.fixtures import documents_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_ingest_dedup_once

    hist = _tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    _STREAM_SEQ[0] += 1
    return run_stream_ingest_dedup_once(
        spark,
        documents_stream_dir(sf_dir),
        hist,
        query_name=f"q_stream_ing_{_STREAM_SEQ[0]}",
    )


def _q_stream_quality(spark, sf_dir):
    """Streaming quality gate: the batch d_quality_filter program run
    unmodified over the document file-stream — stateless projection, so
    append-mode output is final on arrival with no watermark/state story.
    Oracle: the identical batch quality-filter SQL (stream==batch)."""
    from timberjack_spark.fixtures import documents_stream_dir
    from timberjack_spark.streaming.pipeline import run_stream_quality_once

    _STREAM_SEQ[0] += 1
    return run_stream_quality_once(
        spark, documents_stream_dir(sf_dir), query_name=f"q_stream_q_{_STREAM_SEQ[0]}"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict order is the driver's adjudication order and its correctness gate
    # checks the FIRST 50 entries. Never-yet-adjudicated and least-recently
    # adjudicated entries therefore lead — in r05 that is the two NEW queries
    # plus the 11 entries whose last driver check was r03 — and the 13-entry
    # tail carries the most-stable core queries (green r01..r04), so no
    # entry's green history is ever older than the previous round.
    # (VERDICT r03 ask #1 / r04 ask #5: every entry green in rounds N-1 ∪ N.)
    return {
        # -- NEW r05: never driver-adjudicated --
        "e_semantic_dedup": _q_semantic_dedup,    # SemDeDup: cluster-blocked pair prune
        "d_span_dedup": _q_span_dedup,            # C4 span dedup: rebuild from first occurrences
        "d_seq_packing": _q_seq_packing,          # greedy token-budget bin packing per shard
        "d_dataset_card": _q_dataset_card,        # per-(split,lang) release statistics rollup
        "d_temperature_sample": _q_temperature_sample,  # alpha-flattened domain mixture
        "d_tfidf_topk": _q_tfidf_topk,            # per-doc distinguishing terms (tf/df)
        "d_chunk_docs": _q_chunk_docs,            # sliding-window RAG chunking (no shuffle)
        "d_contam_report": _q_contam_report,      # per-eval-doc contamination report
        "d_length_histogram": _q_length_histogram,  # pow-2 token-length buckets
        "s_stream_ingest_dedup": _q_stream_ingest_dedup,  # stateless novelty admission
        "d_snapshot_diff": _q_snapshot_diff,      # release diff (added/removed/modified)
        "d_inverted_index": _q_inverted_index,    # posting lists w/ map-side group limit
        "d_curation_pipeline": _q_curation_pipeline,  # capstone: full pass, one plan
        "d_quality_filter_v2": _q_quality_filter_v2,  # + Gopher repetition rules
        "m_video_features": _q_video_features,    # REAL Y4M demux/decode
        "d_dedup_clusters": _q_dedup_clusters,    # transitive near-dup CC (recursive-CTE oracle)
        "d_split_assign": _q_split_assign,        # deterministic train/val/test hash split
        "d_quota_sample": _q_quota_sample,        # per-language mixture rebalancing
        "s_stream_quality": _q_stream_quality,    # quality gate under streaming (6th stage)
        # -- rotated IN (last adjudicated r03; green r01+r02+r03) --
        "q_events_quantiles": _q_events_quantiles,
        "t_conv_stats": _q_conv_stats,
        "t_hourly_level_matrix": _q_hourly_level_matrix,
        "q_lineitem_pricing": _q_lineitem_pricing,
        "q_top_customers": _q_top_customers,
        "q_events_hourly": _q_events_hourly,
        "q_events_sessions": _q_events_sessions,
        "q_top3_parts_per_brand": _q_top3_parts_per_brand,
        "q_orders_rollup": _q_orders_rollup,
        "q_lineitem_running": _q_lineitem_running,
        "q_mktsegment_pivot": _q_mktsegment_pivot,
        # -- adjudicated r04 (operators changed this round lead) --
        "d_quality_filter": _q_quality_filter,    # keep/drop + reasons (null_text new)
        "d_contam_flags": _q_contam_flags,        # string-keyed 8-gram decontamination
        "s_stream_decontam": _q_stream_decontam,  # stream-static decontamination drain
        "d_doc_token_stats": _q_doc_token_stats,  # ws_trim unification r05
        "d_doc_repetition": _q_doc_repetition,    # ws_trim unification r05
        "d_top_terms": _q_top_terms,              # ws_trim unification r05
        "d_jaccard_pairs": _q_jaccard_pairs,
        "s_stream_session_windows": _q_stream_session_windows,
        "e_cosine_pairs": _q_cosine_pairs,        # oracle: exact all-pairs cosine (recall pinned)
        "s_stream_dedup_msgs": _q_stream_dedup,
        "d_bpe_tokens": _q_bpe_tokens,
        "e_centroid_assign": _q_centroid_assign,
        "e_ivf_topk": _q_ivf_topk,                # oracle: IVF semantics in SQL
        "s_stream_level_counts": _q_stream_level_counts,
        "s_stream_conv_sessions": _q_stream_conv_sessions,
        "t_field_coverage": _q_field_coverage,    # JSON schema profiling (drift/sparsity)
        "t_field_histogram": _q_field_histogram,
        "t_route_sink_counts": _q_route_sink_counts,
        "t_enrich_rollup": _q_enrich_rollup,
        "t_turn_ordering": _q_turn_ordering,
        "t_level_histogram_grok": _q_level_histogram_grok,
        "t_salted_conv_counts": _q_salted_conv_counts,
        "t_redacted_lines": _q_redacted_lines,
        "q_session_windows": _q_session_windows,
        "q_events_asof_click": _q_events_asof_click,
        "q_events_range_ctx": _q_events_range_ctx,
        "d_doc_dedup_stats": _q_doc_dedup_stats,
        "d_text_stats": _q_text_stats,
        "d_doc_fingerprint": _q_doc_fingerprint,
        "d_exact_dedup": _q_exact_dedup,
        "d_minhash_pairs": _q_minhash_pairs,      # oracle: exact all-pairs (recall pinned)
        "d_simhash_pairs": _q_simhash_pairs,      # oracle: exact all-pairs (recall pinned)
        "e_brute_topk": _q_brute_topk,
        "e_lsh_topk": _q_lsh_topk,                # oracle: exact top-k (recall pinned)
        "e_label_centroids": _q_label_centroids,
        "m_media_features": _q_media_features,
        "m_audio_features": _q_audio_features,
        "m_image_features": _q_image_features,
        # -- rotation tail (13): green r01..r04, the most-stable core t_* --
        "t_total_count_error": _q_total_count_error,
        "t_level_histogram": _q_level_histogram,
        "t_trend_histogram": _q_trend_histogram,
        "t_error_types": _q_error_types,
        "t_top_errors": _q_top_errors,
        "t_message_stats": _q_message_stats,
        "t_unique_messages": _q_unique_messages,
        "t_level_filter": _q_level_filter,
        "t_pattern_regex": _q_pattern_regex,
        "t_field_filter_service": _q_field_filter_service,
        "t_field_filter_nested": _q_field_filter_nested,
        "t_line_counts": _q_line_counts,
        "t_matched_sample": _q_matched_sample,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — sf0.01 fixture paths are materialized on call
# ---------------------------------------------------------------------------


def _text_stats_sql() -> str:
    """DuckDB twin of functions/text.py::with_text_stats (minus fingerprint)."""
    from timberjack_spark.functions.text import LANG_STOPWORDS

    def _in_list(lang):
        return ",".join(f"'{w}'" for w in LANG_STOPWORDS[lang])

    # split-on-non-word + IN-list, not '\b' regexes: Java \b is Unicode-aware
    # while RE2's is ASCII (see text.stopword_count) — the twins must count
    # with the identical portable construction
    lang_items = ", ".join(
        "{'score': len(list_filter(wtoks, t -> t IN (%s))), 'lang': '%s'}"
        % (_in_list(lang), lang)
        for lang in sorted(LANG_STOPWORDS)
    )
    en_list = _in_list("en")
    return rf"""WITH s0 AS (
      SELECT doc_id, text,
        regexp_split_to_array(lower(text), '[^a-z0-9_]+') AS wtoks
      FROM documents),
    s1 AS (
      SELECT doc_id, text,
        CASE WHEN {_TRIMT} = '' THEN 0
             ELSE len(regexp_split_to_array({_TRIMT}, '{_WSC}+')) END AS n_tokens,
        length(text) AS n_chars,
        length(regexp_replace(text, '[A-Za-z0-9{_WS_CHARS}]', '', 'g')) AS n_punct,
        len(list_filter(wtoks, t -> t IN ({en_list}))) AS sc_en,
        list_max([{lang_items}]) AS best
      FROM s0),
    s2 AS (
      SELECT doc_id, text, n_tokens, n_chars,
        round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END, 6) AS punct_ratio,
        round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE sc_en / n_tokens END, 6) AS stopword_ratio,
        CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_guess
      FROM s1)
    SELECT doc_id, n_tokens, n_chars, punct_ratio, stopword_ratio,
      round(
        (CASE WHEN n_chars >= 64 AND n_chars <= 4096 THEN 1.0
              WHEN n_chars > 4096 THEN 0.7
              ELSE round(n_chars / 64.0, 6) END) * 0.5
        + (CASE WHEN punct_ratio < 0.2 THEN 1.0 ELSE 0.5 END) * 0.25
        + (CASE WHEN stopword_ratio > 0.05 THEN 1.0 ELSE 0.6 END) * 0.25, 6) AS quality,
      lang_guess
    FROM s2"""


def _allpairs_jaccard_sql(threshold: float = 0.5) -> str:
    """Exact all-pairs shingle Jaccard >= threshold over `documents` — the
    oracle for BOTH LSH candidate generators (minhash bands, simhash blocks):
    their exact-verified outputs equal this set when candidate recall is 1,
    which is pinned empirically at sf0.01 (deterministic data + hashes)."""
    return rf"""WITH toks AS (
      SELECT doc_id, text, regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
      FROM documents),
    base AS (
      SELECT doc_id,
        CASE WHEN len(tk) - 2 >= 1
             THEN list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
             ELSE [lower({_TRIMT})] END AS sh
      FROM toks)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.sh, b.sh)) /
                   len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      FROM base a JOIN base b ON a.doc_id < b.doc_id)
    WHERE jaccard >= {threshold}"""


def _dedup_clusters_sql(threshold: float = 0.5) -> str:
    """Transitive closure of the exact all-pairs near-dup graph (same shingle
    CTEs as _allpairs_jaccard_sql) via a recursive CTE; cluster = min
    reachable id; docs in no pair are their own singleton."""
    return rf"""WITH RECURSIVE toks AS (
      SELECT doc_id, text, regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
      FROM documents),
    base AS (
      SELECT doc_id,
        CASE WHEN len(tk) - 2 >= 1
             THEN list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
             ELSE [lower({_TRIMT})] END AS sh
      FROM toks),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh)) /
                     len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM base a JOIN base b ON a.doc_id < b.doc_id)
      WHERE jaccard >= {threshold}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT doc_id AS node, doc_id AS r FROM documents
      UNION
      SELECT e.a, rr.r FROM edges e JOIN reach rr ON rr.node = e.b)
    SELECT node AS doc_id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY node"""


_BRUTE_TOPK_SQL = """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_dot_product(q.v, c.v) /
                           (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
              FROM q JOIN e c ON c.vec_id <> q.vec_id)
            SELECT query_id, rank, neighbor_id, cos FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= 3"""


def _ivf_topk_sql(k: int = 3, n_probe: int = 3) -> str:
    """DuckDB twin of similarity.py::ivf_topk — NOT an exact-top-k stand-in:
    the oracle reproduces the IVF semantics (centroid assignment, probe-limited
    cells, re-rank inside them), so it adjudicates the approximate algorithm
    itself, not a recall coincidence."""
    cos = (
        "round(list_dot_product({a}, {b}) /"
        " (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""WITH cent AS (
              SELECT label, i AS pos, avg(embedding[i]::DOUBLE) AS m
              FROM embeddings, range(1, 65) t(i) GROUP BY label, i),
            carr AS (SELECT label, array_agg(m ORDER BY pos) AS centroid FROM cent GROUP BY label),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            assign_scored AS (
              SELECT e.vec_id, c.label AS cluster,
                     {cos.format(a="e.v", b="c.centroid")} AS ac
              FROM e CROSS JOIN carr c),
            assign AS (
              SELECT vec_id, cluster FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ac DESC, cluster ASC) AS r
                FROM assign_scored) WHERE r = 1),
            q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
            probe_scored AS (
              SELECT q.vec_id AS query_id, c.label AS cluster,
                     {cos.format(a="q.v", b="c.centroid")} AS qc
              FROM q CROSS JOIN carr c),
            probes AS (
              SELECT query_id, cluster FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qc DESC, cluster ASC) AS r
                FROM probe_scored) WHERE r <= {n_probe}),
            cand AS (
              SELECT p.query_id, a.vec_id AS neighbor_id
              FROM probes p JOIN assign a ON a.cluster = p.cluster
              WHERE a.vec_id <> p.query_id),
            scored AS (
              SELECT c.query_id, c.neighbor_id,
                     {cos.format(a="q.v", b="n.v")} AS cos
              FROM cand c JOIN q ON q.vec_id = c.query_id
                          JOIN e n ON n.vec_id = c.neighbor_id)
            SELECT query_id, rank, neighbor_id, cos FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= {k}"""


def _quality_filter_sql(
    max_dup_frac: float | None = None, max_top_frac: float | None = None
) -> str:
    """DuckDB twin of functions/text.py::quality_filter. With the repetition
    thresholds set it appends the Gopher high_dup / top_token_dominance rules
    computed from the same (doc, token) -> doc aggregation d_doc_repetition
    uses, left-joined on doc_id (null/empty docs get NULL fracs and pass the
    repetition rules — null_text/too_short already dropped them)."""
    rep_cte, rep_join, rep_rules = "", "", ""
    if max_dup_frac is not None or max_top_frac is not None:
        rep_cte = rf""",
            tok AS (
              SELECT doc_id, unnest(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS tk
              FROM documents),
            tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
            rep AS (
              SELECT doc_id, round(1 - count(*) / sum(c), 6) AS dup_frac,
                     round(max(c) / sum(c), 6) AS top_frac
              FROM tc GROUP BY doc_id)"""
        rep_join = " LEFT JOIN rep USING (doc_id)"
    if max_dup_frac is not None:
        rep_rules += f",\n                  CASE WHEN dup_frac > {max_dup_frac} THEN 'high_dup' END"
    if max_top_frac is not None:
        rep_rules += (
            f",\n                  CASE WHEN top_frac > {max_top_frac} THEN 'top_token_dominance' END"
        )
    return rf"""WITH s1 AS (
              SELECT doc_id, text IS NULL AS is_null,
                CASE WHEN {_TRIMT} = '' THEN 0
                     ELSE len(regexp_split_to_array({_TRIMT}, '{_WSC}+')) END AS n_tokens,
                length(text) AS n_chars,
                length(regexp_replace(text, '[A-Za-z0-9{_WS_CHARS}]', '', 'g')) AS n_punct,
                len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                                t -> t IN ({_EN_IN_LIST}))) AS sc_en
              FROM documents),
            s2 AS (
              SELECT doc_id, is_null, n_tokens,
                round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END, 6) AS pr,
                round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE sc_en / n_tokens END, 6) AS sr
              FROM s1){rep_cte},
            r AS (
              SELECT doc_id, n_tokens,
                CASE WHEN is_null THEN 'null_text'
                ELSE coalesce(array_to_string(list_filter([
                  CASE WHEN n_tokens < 10 THEN 'too_short' END,
                  CASE WHEN n_tokens > 5000 THEN 'too_long' END,
                  CASE WHEN pr > 0.25 THEN 'high_punct' END,
                  CASE WHEN sr < 0.01 THEN 'low_stopword' END{rep_rules}
                ], x -> x IS NOT NULL), ','), '') END AS reasons
              FROM s2{rep_join})
            SELECT doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens, reasons, reasons = '' AS keep
            FROM r"""


def _jaccard_pairs_sql(threshold: float = 0.12) -> str:
    """DuckDB twin of operators/dedup.py::ngram_jaccard_pairs (block = lang, n=3)."""
    return rf"""WITH toks AS (
      SELECT lang, doc_id, text, regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
      FROM documents),
    base AS (
      SELECT lang, doc_id,
        CASE WHEN len(tk) - 2 >= 1
             THEN list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
             ELSE [lower({_TRIMT})] END AS sh
      FROM toks WHERE doc_id < 500)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.sh, b.sh)) /
                   len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      FROM base a JOIN base b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jaccard >= {threshold}"""


def _redacted_lines_sql(tp: str) -> str:
    """DuckDB twin of functions/text.py::redact_pii / redaction_count —
    composed from the SAME pattern list so the two cannot drift."""
    from timberjack_spark.functions.text import REDACTION_PATTERNS

    red = "text"
    for pat, repl in REDACTION_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    cnt = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat, _ in REDACTION_PATTERNS
    )
    return f"""WITH red AS (
          SELECT {red} AS line, {cnt} AS n_red
          FROM read_parquet('{tp}'))
        SELECT line, count(*) AS cnt, sum(n_red)::BIGINT AS n_redactions
        FROM red WHERE n_red > 0 GROUP BY line"""


def _oracle_sql_base() -> dict[str, str]:
    from timberjack_spark.fixtures import transcripts_stream_dir

    tp = transcripts_path("sf0.01")
    sp = os.path.join(transcripts_stream_dir("sf0.01"), "*.parquet")
    role_p, tool_p = dim_path("dim_role"), dim_path("dim_tool")
    T = f"SELECT * FROM read_parquet('{tp}')"
    P = osql.parsed_cte(T)
    LV = osql.level_sql("text")
    CAT = osql.category_sql()

    return {
        "t_total_count_error": f"SELECT count(*) AS cnt FROM read_parquet('{tp}') WHERE contains(text, 'ERROR')",
        "t_level_histogram": f"{P} SELECT level, count(*) AS cnt FROM parsed GROUP BY level",
        "t_trend_histogram": f"{P} SELECT bucket, count(*) AS cnt FROM parsed WHERE bucket <> '' GROUP BY bucket",
        "t_error_types": f"{P} SELECT error_type, count(*) AS cnt FROM parsed WHERE error_type <> '' GROUP BY error_type",
        "t_top_errors": f"""{P}, hist AS (
            SELECT error_type, count(*) AS cnt FROM parsed WHERE error_type <> '' GROUP BY error_type)
            SELECT error_type, cnt, rank FROM (
              SELECT error_type, cnt, row_number() OVER (ORDER BY cnt DESC, error_type ASC) AS rank FROM hist)
            WHERE rank <= 5""",
        "t_message_stats": f"""{P} SELECT count(*) AS cnt, count(DISTINCT msg_key) AS unique_cnt,
            round(CASE WHEN count(*) = 0 THEN 0.0
                  ELSE (1.0 - count(DISTINCT msg_key) / count(*)) * 100.0 END, 6) AS repetition_ratio
            FROM parsed""",
        "t_unique_messages": f"""{P} SELECT DISTINCT msg_key AS message FROM parsed
            WHERE contains(text, 'Cache')""",
        "t_level_filter": f"""{P} SELECT count(*) AS cnt FROM parsed
            WHERE level <> '' AND upper(level) = 'ERROR'""",
        "t_pattern_regex": f"SELECT count(*) AS cnt FROM read_parquet('{tp}') WHERE regexp_matches(text, 'user_[0-9]+')",
        "t_field_filter_service": f"""SELECT count(*) AS cnt FROM (
              SELECT text, json_extract_string(try_cast(trim(text, {osql.WS_SQL}) AS JSON), '$.service') AS fv
              FROM read_parquet('{tp}'))
            WHERE CASE WHEN fv IS NOT NULL
                       THEN lower(trim(fv, {osql.WS_SQL})) = 'api'
                  ELSE contains(lower(text), 'service') AND contains(lower(text), 'api') END""",
        "t_field_filter_nested": f"""SELECT count(*) AS cnt FROM (
              SELECT text, json_extract_string(try_cast(trim(text, {osql.WS_SQL}) AS JSON), '$.user.role') AS fv
              FROM read_parquet('{tp}'))
            WHERE CASE WHEN fv IS NOT NULL
                       THEN lower(trim(fv, {osql.WS_SQL})) = 'admin'
                  ELSE contains(lower(text), 'user.role') AND contains(lower(text), 'admin') END""",
        # bounded-depth flatten (DuckDB 1.0 has no json_tree): the fixture's
        # JSON grammar nests at most 3 levels with no arrays, so 3 explicit
        # levels adjudicate every path; the general recursion/cap semantics
        # are pinned by tests/test_fields.py
        "t_field_coverage": f"""WITH j AS (
              SELECT trim(text, {osql.WS_SQL})::JSON AS doc FROM read_parquet('{tp}')
              WHERE json_valid(trim(text, {osql.WS_SQL}))
                AND trim(text, {osql.WS_SQL}) LIKE '{{%' AND trim(text, {osql.WS_SQL}) LIKE '%}}'),
            l1 AS (SELECT doc, unnest(json_keys(doc)) AS k1 FROM j),
            l1t AS (SELECT doc, k1, json_type(doc, '$.' || k1) AS t1 FROM l1),
            l2 AS (SELECT doc, k1, unnest(json_keys(doc, '$.' || k1)) AS k2 FROM l1t WHERE t1 = 'OBJECT'),
            l2t AS (SELECT doc, k1, k2, json_type(doc, '$.' || k1 || '.' || k2) AS t2 FROM l2),
            l3 AS (SELECT doc, k1, k2, unnest(json_keys(doc, '$.' || k1 || '.' || k2)) AS k3
                   FROM l2t WHERE t2 = 'OBJECT'),
            l3t AS (SELECT doc, k1, k2, k3, json_type(doc, '$.' || k1 || '.' || k2 || '.' || k3) AS t3 FROM l3),
            leaves AS (
              SELECT doc, k1 AS field, t1 AS t, '$.' || k1 AS p
              FROM l1t WHERE t1 NOT IN ('OBJECT', 'ARRAY')
              UNION ALL
              SELECT doc, k1 || '.' || k2, t2, '$.' || k1 || '.' || k2
              FROM l2t WHERE t2 NOT IN ('OBJECT', 'ARRAY')
              UNION ALL
              SELECT doc, k1 || '.' || k2 || '.' || k3, t3, '$.' || k1 || '.' || k2 || '.' || k3
              FROM l3t WHERE t3 NOT IN ('OBJECT', 'ARRAY')),
            v AS (SELECT field,
                         CASE WHEN t = 'NULL' THEN 'null'
                              ELSE json_extract_string(doc, p) END AS value
                  FROM leaves),
            tot AS (SELECT count(*) AS n_json FROM j),
            per AS (SELECT field, count(*) AS n_present,
                           count(DISTINCT value) AS n_distinct FROM v GROUP BY field)
            SELECT field, n_present, n_distinct,
                   n_present::DOUBLE / n_json AS coverage
            FROM per, tot""",
        "t_field_histogram": f"""WITH j AS (
              SELECT trim(text, {osql.WS_SQL})::JSON AS doc FROM read_parquet('{tp}')
              WHERE json_valid(trim(text, {osql.WS_SQL}))
                AND trim(text, {osql.WS_SQL}) LIKE '{{%' AND trim(text, {osql.WS_SQL}) LIKE '%}}'),
            l1 AS (SELECT doc, unnest(json_keys(doc)) AS k1 FROM j),
            l1t AS (SELECT doc, k1, json_type(doc, '$.' || k1) AS t1 FROM l1),
            l2 AS (SELECT doc, k1, unnest(json_keys(doc, '$.' || k1)) AS k2 FROM l1t WHERE t1 = 'OBJECT'),
            l2t AS (SELECT doc, k1, k2, json_type(doc, '$.' || k1 || '.' || k2) AS t2 FROM l2),
            l3 AS (SELECT doc, k1, k2, unnest(json_keys(doc, '$.' || k1 || '.' || k2)) AS k3
                   FROM l2t WHERE t2 = 'OBJECT'),
            l3t AS (SELECT doc, k1, k2, k3, json_type(doc, '$.' || k1 || '.' || k2 || '.' || k3) AS t3 FROM l3),
            leaves AS (
              SELECT k1 AS field FROM l1t WHERE t1 NOT IN ('OBJECT', 'ARRAY')
              UNION ALL SELECT k1 || '.' || k2 FROM l2t WHERE t2 NOT IN ('OBJECT', 'ARRAY')
              UNION ALL SELECT k1 || '.' || k2 || '.' || k3 FROM l3t WHERE t3 NOT IN ('OBJECT', 'ARRAY'))
            SELECT field, count(*) AS cnt FROM leaves GROUP BY field""",
        "t_line_counts": f"""SELECT text AS line, count(*) AS cnt
            FROM read_parquet('{tp}')
            WHERE contains(text, 'Cache') AND length(text) > 0 GROUP BY text""",
        "t_matched_sample": f"""SELECT text AS line, count(*) AS cnt
            FROM read_parquet('{tp}')
            WHERE contains(text, 'ERROR') AND length(text) > 0 GROUP BY text
            ORDER BY cnt DESC, line ASC LIMIT 50""",
        "t_route_sink_counts": f"""{P} SELECT {CAT} AS category, count(*) AS cnt
            FROM parsed GROUP BY 1""",
        "t_enrich_rollup": f"""{P}, routed AS (SELECT *, {CAT} AS category FROM parsed)
            SELECT p.category, r.role_group, tl.tool_family, count(*) AS cnt
            FROM routed p
            LEFT JOIN read_parquet('{role_p}') r ON p.role = r.role
            LEFT JOIN read_parquet('{tool_p}') tl ON p.tool = tl.tool
            GROUP BY 1, 2, 3""",
        "t_turn_ordering": f"""SELECT conv_id, turn_idx,
            row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS turn_rank
            FROM read_parquet('{tp}') WHERE conv_id = 'conv-000000'""",
        "t_conv_stats": f"""SELECT conv_id, count(*) AS n_turns,
            sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)::BIGINT AS n_tool_turns,
            count(DISTINCT role) AS n_roles,
            min(ts) AS first_ts, max(ts) AS last_ts
            FROM read_parquet('{tp}') GROUP BY conv_id""",
        "t_hourly_level_matrix": f"""SELECT date_trunc('hour', ts) AS hour, {LV} AS level, count(*) AS cnt
            FROM read_parquet('{tp}') GROUP BY 1, 2""",
        "q_lineitem_pricing": """SELECT l_returnflag, l_linestatus,
            sum(l_quantity) AS sum_qty,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            round(avg(l_quantity), 6) AS avg_qty,
            count(*) AS cnt
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "q_top_customers": """WITH rev AS (
              SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue FROM orders GROUP BY o_custkey)
            SELECT c_custkey, c_name, n_name, revenue
            FROM rev JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue DESC, c_custkey ASC LIMIT 10""",
        "q_events_hourly": """SELECT date_trunc('hour', ts) AS hour, event_type,
            count(*) AS cnt, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2""",
        "q_top3_parts_per_brand": """SELECT p_brand, rnk, p_partkey, p_name, price FROM (
              SELECT p_brand, p_partkey, p_name, round(p_retailprice, 2) AS price,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
              FROM part)
            WHERE rnk <= 3""",
        "q_orders_rollup": """SELECT o_orderstatus, o_orderpriority,
              count(*) AS cnt, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "q_lineitem_running": """SELECT l_suppkey, l_orderkey, l_linenumber,
              sum(l_quantity) OVER (PARTITION BY l_suppkey
                                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
            FROM lineitem WHERE l_suppkey < 20""",
        "q_mktsegment_pivot": """SELECT c_mktsegment,
              sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS cnt_f,
              sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS cnt_o,
              sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS cnt_p
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "q_events_sessions": """WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM events)
            SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
            FROM g GROUP BY user_id""",
        "q_session_windows": """WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              -- sid window orders by (ts, event_id) — the SAME total order new_s
              -- was computed over; ts alone would make the running sum's tie
              -- order nondeterministic at duplicate-ts session boundaries
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM g)
            SELECT user_id, min(ts) AS session_start, count(*) AS n_events
            FROM s GROUP BY user_id, sid""",
        "q_events_quantiles": """SELECT event_type,
              round(quantile_cont(value, 0.25), 6) AS p25,
              round(quantile_cont(value, 0.50), 6) AS p50,
              round(quantile_cont(value, 0.75), 6) AS p75,
              round(quantile_cont(value, 0.95), 6) AS p95,
              count(*) AS cnt
            FROM events GROUP BY event_type""",
        "q_events_asof_click": """WITH err AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            clk AS (
              SELECT user_id, ts, event_id, value FROM (
                SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click') WHERE rn = 1)
            SELECT e.event_id, e.user_id, c.event_id AS click_id,
                   c.ts AS click_ts, c.value AS click_value
            FROM err e ASOF LEFT JOIN clk c
              ON e.user_id = c.user_id AND e.ts >= c.ts""",
        "q_events_range_ctx": """WITH err AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
            SELECT e.event_id, e.user_id, count(r.event_id) AS n_prior_30m
            FROM err e LEFT JOIN events r
              ON e.user_id = r.user_id
             AND r.ts >= e.ts - INTERVAL 30 MINUTE AND r.ts < e.ts
            GROUP BY e.event_id, e.user_id""",
        "d_doc_dedup_stats": """SELECT count(*) AS n_docs,
            count(DISTINCT md5(text)) AS n_distinct,
            count(*) - count(DISTINCT md5(text)) AS n_dup_docs
            FROM documents""",
        "d_doc_token_stats": rf"""SELECT doc_id,
            len(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS n_tokens,
            length(text) AS n_chars_actual,
            len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9_]+'),
                            t -> t IN ('the','a','of','and','in'))) AS n_stopwords
            FROM documents""",
        # the pandas-UDF grok path must produce the identical histogram
        "t_level_histogram_grok": f"{P} SELECT level, count(*) AS cnt FROM parsed GROUP BY level",
        "t_salted_conv_counts": f"SELECT conv_id, count(*) AS cnt FROM read_parquet('{tp}') GROUP BY conv_id",
        "d_text_stats": _text_stats_sql(),
        "d_doc_fingerprint": """SELECT doc_id,
            CASE WHEN length(text) = 0 THEN 0
                 ELSE list_reduce(
                        list_prepend(0::BIGINT,
                          list_transform(string_split(text, ''), c -> unicode(c)::BIGINT)),
                        (a, b) -> (a * 31 + b) % 1000000007)
            END AS fp
            FROM documents""",
        "t_redacted_lines": _redacted_lines_sql(tp),
        "d_doc_repetition": rf"""WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS tk
              FROM documents),
            c AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
            a AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
                         max(c) AS top_cnt
                  FROM c GROUP BY doc_id)
            SELECT doc_id, n_tokens, n_distinct,
                   round(1 - n_distinct / n_tokens, 6) AS dup_frac,
                   round(top_cnt / n_tokens, 6) AS top_frac
            FROM a""",
        "d_top_terms": rf"""WITH tok AS (
              SELECT unnest(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS term
              FROM documents),
            c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term)
            SELECT term, cnt, rank FROM (
              SELECT term, cnt,
                     row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
              FROM c)
            WHERE rank <= 50""",
        "d_exact_dedup": """SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)""",
        "d_jaccard_pairs": _jaccard_pairs_sql(),
        "d_minhash_pairs": _allpairs_jaccard_sql(0.5),
        "d_dedup_clusters": _dedup_clusters_sql(0.5),
        "d_split_assign": """SELECT doc_id,
            CASE WHEN b < 9800 THEN 'train' WHEN b < 9900 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id,
                    ('0x' || substring(md5('v1:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b
                  FROM documents)""",
        "d_quota_sample": """SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                ('0x' || substring(md5('s1:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b,
                CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'es' THEN 2500 ELSE 10000 END AS t
              FROM documents)
            WHERE b < t""",
        "d_curation_pipeline": rf"""WITH qf AS ({_quality_filter_sql()}),
            reps AS (SELECT md5(text) AS h, min(doc_id) AS rep
                     FROM documents GROUP BY md5(text)),
            dup AS (SELECT d.doc_id, d.doc_id <> r.rep AS is_dup
                    FROM documents d JOIN reps r ON md5(d.text) = r.h),
            ctoks AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
              FROM documents),
            csh AS (
              SELECT doc_id,
                CASE WHEN len(tk) - 7 >= 1
                     THEN list_distinct(list_transform(range(1, len(tk) - 6),
                            i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                     ELSE [lower({_TRIMT})] END AS sh
              FROM ctoks),
            eg AS (SELECT DISTINCT unnest(sh) AS g FROM csh WHERE doc_id % 7 = 0),
            tg AS (SELECT doc_id, unnest(sh) AS g FROM csh),
            hits AS (SELECT doc_id, count(*) AS n FROM tg
                     WHERE g IN (SELECT g FROM eg) GROUP BY doc_id),
            con AS (SELECT d.doc_id, coalesce(n, 0) > 0 AS contaminated
                    FROM documents d LEFT JOIN hits USING (doc_id)),
            sb AS (SELECT doc_id,
                     CASE WHEN b < 9800 THEN 'train' WHEN b < 9900 THEN 'val'
                          ELSE 'test' END AS split
                   FROM (SELECT doc_id,
                           ('0x' || substring(md5('v1:' || doc_id::VARCHAR), 1, 8))::BIGINT
                           % 10000 AS b
                         FROM documents)),
            q AS (SELECT doc_id, keep AS keep_quality FROM qf)
            SELECT q.doc_id, q.keep_quality, dup.is_dup, con.contaminated, sb.split,
                   (q.keep_quality AND NOT dup.is_dup AND NOT con.contaminated)
                     AS admitted
            FROM q JOIN dup USING (doc_id) JOIN con USING (doc_id)
                   JOIN sb USING (doc_id)""",
        "d_inverted_index": rf"""WITH tok AS (
              SELECT DISTINCT term, doc_id FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS term
                FROM documents)
              WHERE term <> ''),
            dfq AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
            ranked AS (
              SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
              FROM tok),
            posts AS (
              SELECT term, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
              FROM ranked WHERE r <= 1000 GROUP BY term)
            SELECT term, df, postings FROM dfq JOIN posts USING (term)""",
        "d_snapshot_diff": """WITH prev AS (
              SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 THEN text || ' [v1]' ELSE text END AS text
              FROM documents WHERE doc_id % 11 <> 0)
            SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
                   CASE WHEN p.doc_id IS NULL THEN 'added'
                        WHEN c.doc_id IS NULL THEN 'removed'
                        WHEN md5(c.text) = md5(p.text) THEN 'unchanged'
                        ELSE 'modified' END AS status
            FROM documents c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id""",
        # text IS NULL arm: Spark's left_anti KEEPS null-key rows (null never
        # matches) while bare SQL NOT IN would drop them via NULL comparison —
        # the admission filter passes what it cannot hash (pinned in pytest)
        "s_stream_ingest_dedup": """SELECT doc_id FROM documents
            WHERE text IS NULL OR md5(text) NOT IN
                  (SELECT md5(text) FROM documents
                   WHERE doc_id % 5 = 0 AND text IS NOT NULL)""",
        "d_length_histogram": rf"""WITH t AS (
              SELECT CASE WHEN text IS NULL OR {_TRIMT} = '' THEN 0
                          ELSE len(regexp_split_to_array({_TRIMT}, '{_WSC}+')) END AS n_tokens
              FROM documents)
            SELECT CASE WHEN n_tokens = 0 THEN 0
                        ELSE length(bin(n_tokens)) END::INT AS bucket,
                   count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS total_tokens,
                   min(n_tokens) AS min_tokens,
                   max(n_tokens) AS max_tokens
            FROM t GROUP BY 1""",
        "d_contam_report": rf"""WITH toks AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(tk) - 7 >= 1
                     THEN list_distinct(list_transform(range(1, len(tk) - 6),
                            i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                     ELSE [lower({_TRIMT})] END AS sh
              FROM toks),
            eg AS (SELECT doc_id AS eval_id, unnest(sh) AS g FROM sh WHERE doc_id % 7 = 0),
            tg AS (SELECT doc_id AS train_id, unnest(sh) AS g FROM sh WHERE doc_id % 7 <> 0),
            p AS (SELECT eg.eval_id, tg.train_id, eg.g
                  FROM eg JOIN tg USING (g) WHERE g IS NOT NULL),
            a AS (SELECT eval_id, count(DISTINCT g) AS n_grams_hit,
                         count(DISTINCT train_id) AS n_train_docs_hit
                  FROM p GROUP BY eval_id)
            SELECT d.doc_id,
                   coalesce(n_grams_hit, 0)::BIGINT AS n_grams_hit,
                   coalesce(n_train_docs_hit, 0)::BIGINT AS n_train_docs_hit,
                   coalesce(n_grams_hit, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) d
            LEFT JOIN a ON a.eval_id = d.doc_id""",
        "d_chunk_docs": rf"""WITH tk AS (
              SELECT doc_id, regexp_split_to_array({_TRIMT}, '{_WSC}+') AS t
              FROM documents WHERE text IS NOT NULL AND {_TRIMT} <> ''),
            st AS (SELECT doc_id, t, len(t) AS n,
                          unnest(range(0, len(t), 48)) AS s FROM tk)
            SELECT doc_id, CAST(s // 48 AS INT) AS chunk_idx,
                   CAST(least(64, n - s) AS INT) AS n_tokens,
                   array_to_string(list_slice(t, s + 1, s + 64), ' ') AS chunk_text
            FROM st""",
        "d_tfidf_topk": rf"""WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array({_TRIMT}, '{_WSC}+')) AS term
              FROM documents),
            t AS (SELECT doc_id, term, count(*) AS tf FROM tok
                  WHERE term <> '' GROUP BY doc_id, term),
            dfq AS (SELECT term, count(*) AS df FROM t GROUP BY term)
            SELECT doc_id, term, tf, df, rank FROM (
              SELECT t.doc_id, t.term, t.tf, dfq.df,
                     row_number() OVER (PARTITION BY t.doc_id
                       ORDER BY (t.tf::DOUBLE / dfq.df) DESC, t.term ASC) AS rank
              FROM t JOIN dfq USING (term))
            WHERE rank <= 3""",
        "d_temperature_sample": """WITH c AS (
              SELECT source, count(*) AS n_domain FROM documents GROUP BY source),
            r AS (
              SELECT source, n_domain,
                CAST(floor(sqrt((SELECT min(n_domain) FROM c)::DOUBLE / n_domain::DOUBLE)
                           * 10000) AS BIGINT) AS sample_bp
              FROM c)
            SELECT d.doc_id, d.source, r.n_domain, r.sample_bp,
                   (('0x' || substring(md5('mix-v1:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
                    % 10000) < r.sample_bp AS keep
            FROM documents d JOIN r USING (source)""",
        "d_dataset_card": rf"""WITH qf AS ({_quality_filter_sql()}),
            sb AS (
              SELECT doc_id,
                CASE WHEN b < 9800 THEN 'train' WHEN b < 9900 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      ('0x' || substring(md5('v1:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b
                    FROM documents))
            SELECT sb.split, d.lang,
                   count(*) AS n_docs,
                   sum(qf.n_tokens)::BIGINT AS total_tokens,
                   round(avg(d.n_chars), 4) AS avg_chars,
                   count(CASE WHEN qf.keep THEN 1 END) AS n_keep,
                   round(count(CASE WHEN qf.keep THEN 1 END) / count(*), 4) AS keep_rate
            FROM documents d
            JOIN qf ON qf.doc_id = d.doc_id
            JOIN sb ON sb.doc_id = d.doc_id
            GROUP BY sb.split, d.lang""",
        "d_seq_packing": rf"""WITH RECURSIVE tok AS (
              SELECT doc_id, cast(doc_id % 8 AS INT) AS shard,
                     CASE WHEN text IS NULL OR {_TRIMT} = '' THEN 0
                          ELSE len(regexp_split_to_array({_TRIMT}, '{_WSC}+')) END AS n_tokens
              FROM documents),
            ordered AS (
              SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM tok),
            packing AS (
              SELECT shard, rn, doc_id, n_tokens, 0::BIGINT AS bin_idx, n_tokens AS fill
              FROM ordered WHERE rn = 1
              UNION ALL
              SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
                     CASE WHEN p.fill + o.n_tokens <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
                     CASE WHEN p.fill + o.n_tokens <= 128 THEN p.fill + o.n_tokens ELSE o.n_tokens END
              FROM packing p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1)
            SELECT doc_id, shard, bin_idx, n_tokens FROM packing""",
        "d_simhash_pairs": _allpairs_jaccard_sql(0.5),
        "e_cosine_pairs": """WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 10000000, list_transform(v, x -> x + 0.02) FROM base)
            SELECT id_a, id_b, cos FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
            WHERE cos >= 0.95""",
        "e_brute_topk": _BRUTE_TOPK_SQL,
        "e_lsh_topk": _BRUTE_TOPK_SQL,
        "e_ivf_topk": _ivf_topk_sql(k=3, n_probe=3),
        "e_label_centroids": """SELECT label, i - 1 AS pos,
              round(avg(embedding[i]::DOUBLE), 5) AS centroid_val
            FROM embeddings, range(1, 65) t(i)
            GROUP BY label, i""",
        "e_centroid_assign": """WITH cent AS (
              SELECT label, i AS pos, avg(embedding[i]::DOUBLE) AS m
              FROM embeddings, range(1, 65) t(i) GROUP BY label, i),
            carr AS (SELECT label, array_agg(m ORDER BY pos) AS centroid FROM cent GROUP BY label),
            scored AS (
              SELECT e.vec_id, c.label AS cluster,
                     round(list_dot_product(e.embedding::DOUBLE[], c.centroid) /
                           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                            sqrt(list_dot_product(c.centroid, c.centroid))), 6) AS cos
              FROM embeddings e CROSS JOIN carr c)
            SELECT vec_id, cluster, cos FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster ASC) AS r
              FROM scored)
            WHERE r = 1""",
        "d_span_dedup": rf"""WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(coalesce(text, ''), {osql.WS_SQL})),
                                           '{_WSC}+') AS tk
              FROM documents),
            sp AS (
              SELECT doc_id,
                     unnest(range(0, cast(ceil(len(tk) / 13.0) AS INT))) AS span_idx,
                     tk
              FROM toks),
            spans AS (
              SELECT doc_id, span_idx,
                     array_to_string(list_slice(tk, span_idx * 13 + 1, span_idx * 13 + 13),
                                     ' ') AS span
              FROM sp),
            kept AS (
              SELECT doc_id, span_idx, span,
                     row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) = 1 AS k
              FROM spans)
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN k THEN span END, ' ' ORDER BY span_idx),
                            '') AS clean_text,
                   count(CASE WHEN k THEN 1 END) AS n_kept,
                   count(*) AS n_spans
            FROM kept GROUP BY doc_id""",
        "e_semantic_dedup": """WITH base AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            aug AS (
              SELECT vec_id, label, v FROM base
              UNION ALL
              SELECT vec_id + 10000000, label, list_transform(v, x -> x + 0.02) FROM base),
            cent AS (
              SELECT label, i AS pos, avg(v[i]) AS m
              FROM aug, range(1, 65) t(i) GROUP BY label, i),
            carr AS (SELECT label, array_agg(m ORDER BY pos) AS centroid FROM cent GROUP BY label),
            scored AS (
              SELECT e.vec_id, c.label AS cluster,
                     round(list_dot_product(e.v, c.centroid) /
                           (sqrt(list_dot_product(e.v, e.v)) *
                            sqrt(list_dot_product(c.centroid, c.centroid))), 6) AS cos
              FROM aug e CROSS JOIN carr c),
            assigned AS (
              SELECT vec_id, cluster FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster ASC) AS r
                FROM scored)
              WHERE r = 1),
            dup AS (
              SELECT DISTINCT b.vec_id
              FROM assigned a
              JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              JOIN aug va ON va.vec_id = a.vec_id
              JOIN aug vb ON vb.vec_id = b.vec_id
              WHERE round(list_dot_product(va.v, vb.v) /
                          (sqrt(list_dot_product(va.v, va.v)) *
                           sqrt(list_dot_product(vb.v, vb.v))), 6) >= 0.95)
            SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep
            FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id""",
        "d_quality_filter": _quality_filter_sql(),
        "s_stream_quality": _quality_filter_sql(),  # stream==batch: identical gate
        "d_quality_filter_v2": _quality_filter_sql(max_dup_frac=0.6, max_top_frac=0.2),
        "s_stream_decontam": rf"""WITH toks AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(tk) - 7 >= 1
                     THEN list_distinct(list_transform(range(1, len(tk) - 6),
                            i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                     ELSE [lower({_TRIMT})] END AS sh
              FROM toks),
            eg AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 7 = 0),
            tg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 7 <> 0)
            SELECT DISTINCT doc_id FROM tg WHERE g IN (SELECT g FROM eg)""",
        "d_contam_flags": rf"""WITH toks AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower({_TRIMT}), '{_WSC}+') AS tk
              FROM documents),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(tk) - 7 >= 1
                     THEN list_distinct(list_transform(range(1, len(tk) - 6),
                            i -> array_to_string(list_slice(tk, i, i + 7), ' ')))
                     ELSE [lower({_TRIMT})] END AS sh
              FROM toks),
            eg AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 7 = 0),
            tg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 7 <> 0),
            hits AS (SELECT doc_id, count(*) AS n FROM tg
                     WHERE g IN (SELECT g FROM eg) GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(n, 0)::BIGINT AS n_eval_grams_hit,
                   coalesce(n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
            LEFT JOIN hits USING (doc_id)""",
        "d_bpe_tokens": rf"""SELECT doc_id,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9{_WS_CHARS}]')) AS n_bpe_tokens
            FROM documents""",
        "s_stream_level_counts": f"""{osql.parsed_cte(f"SELECT * FROM read_parquet('{sp}')")}
            SELECT date_trunc('hour', ts) AS win_start, level, count(*) AS cnt
            FROM parsed GROUP BY 1, 2""",
        "s_stream_dedup_msgs": f"""{osql.parsed_cte(f"SELECT * FROM read_parquet('{sp}')")}
            SELECT DISTINCT msg_key FROM parsed""",
        "s_stream_conv_sessions": f"""{osql.parsed_cte(f"SELECT * FROM read_parquet('{sp}')")}
            SELECT conv_id, count(*) AS n_turns,
                   sum(CASE WHEN {osql.category_sql()} = 'errors' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
                   max(turn_idx)::BIGINT AS last_turn_idx
            FROM parsed GROUP BY conv_id""",
        "m_audio_features": """SELECT doc_id AS media_id,
            8000::BIGINT AS sr,
            (2000 + (doc_id % 4) * 2000)::BIGINT AS n_samples,
            ((2000 + (doc_id % 4) * 2000) / 8)::BIGINT AS duration_ms,
            (50 + doc_id % 100) * 8000.0 / (2000 + (doc_id % 4) * 2000) AS dom_freq_hz
            FROM documents""",
        "m_image_features": """SELECT doc_id AS media_id,
            (16 + doc_id % 16)::BIGINT AS width,
            (16 + doc_id % 9)::BIGINT AS height,
            (doc_id * 37 % 256)::DOUBLE AS mean_r,
            (doc_id * 59 % 256)::DOUBLE AS mean_g,
            (doc_id * 83 % 256)::DOUBLE AS mean_b
            FROM documents""",
        # closed-form twin of the Y4M synthesis params (_y4m_params_vec):
        # frame t's constant luma plane is (y0 + t*dy) % 256, chroma u0/v0
        "m_video_features": """SELECT doc_id AS media_id,
            (16 + doc_id % 16)::BIGINT AS width,
            (16 + doc_id % 9)::BIGINT AS height,
            (2 + doc_id % 6)::BIGINT AS n_frames,
            25.0 AS fps,
            list_aggregate(list_transform(range(0, 2 + doc_id % 6),
                t -> ((doc_id * 41 % 256) + t * (1 + doc_id * 17 % 32)) % 256), 'avg') AS mean_y,
            (doc_id * 59 % 256)::DOUBLE AS mean_u,
            (doc_id * 83 % 256)::DOUBLE AS mean_v,
            list_aggregate(list_transform(range(1, 2 + doc_id % 6),
                t -> abs((((doc_id * 41 % 256) + t * (1 + doc_id * 17 % 32)) % 256)
                       - (((doc_id * 41 % 256) + (t - 1) * (1 + doc_id * 17 % 32)) % 256))), 'avg') AS motion
            FROM documents""",
        "m_media_features": """SELECT doc_id AS media_id,
            CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
            octet_length(encode(text)) AS n_bytes,
            sha256(text) AS sha256
            FROM documents""",
    }


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_base()
    # the streaming session-window drain is verified against the IDENTICAL
    # gaps-and-islands batch SQL as q_session_windows: stream==batch is the
    # engine's streaming contract, so the oracle is shared by construction
    sql["s_stream_session_windows"] = sql["q_session_windows"]
    return sql
