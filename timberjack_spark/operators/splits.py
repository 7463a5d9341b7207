"""Deterministic train/val/test split assignment for corpus curation.

The split a training pipeline wants is a pure per-document function — NOT a
global sort/row_number (which reshuffles every assignment when the corpus
grows, breaking eval-set stability) and NOT ``df.randomSplit`` (seed- and
partitioning-dependent, so re-running on a repartitioned corpus moves docs
between splits). Hash-bucketing the id gives assignments that are stable
under corpus growth, repartitioning, and re-runs, and that any other engine
can reproduce (md5 is identical everywhere; the DuckDB oracle twin recomputes
the exact assignment).

One projection over one scan — no shuffle, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# basis-point buckets: 4 decimal digits of split-fraction precision
_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from md5(salt:id) — first 8 hex chars as
    an integer (conv base 16 -> 10), mod bucket count. Portable subset only:
    md5 hex and integer mod behave identically in Spark, DuckDB and Python
    (xxhash64 would be cheaper but exists only in Spark — determinism across
    engines is the point of this operator)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % _BUCKETS


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """(id, split) with split drawn from ``weights`` (fractions summing to
    <= 1; any remainder falls to the LAST named split). Changing ``salt``
    re-deals every assignment — version the salt with the dataset release.

    Default 98/1/1 train/val/test. Assignment is a deterministic function of
    (salt, id) alone: adding documents later never moves an existing doc
    between splits, which is the property that keeps a frozen eval set
    frozen across corpus releases.
    """
    return df.select(F.col(id_col), split_expr(F.col(id_col), salt, weights).alias("split"))


def split_expr(id_col: Column, salt: str, weights: dict[str, float] | None = None) -> Column:
    """The split-name CASE chain as a reusable Column (split_assign's body;
    also fused into single-scan rollups like dataset_card)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) > 1 + 1e-9:
        raise ValueError(f"weights must be nonnegative fractions summing to <= 1: {weights}")
    b = split_bucket(id_col, salt)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def quota_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff its hash
    bucket falls under its stratum's rate — the mixture-rebalancing step a
    training pipeline runs to hit a target source/language distribution
    (downweight a crawl that dominates the corpus, keep all of a rare one).

    Same stability contract as split_assign: keep/drop is a pure function of
    (salt, id, stratum rate), so re-running, repartitioning, or growing the
    corpus never flips an existing doc, and independent pipeline stages
    sampling with the same salt agree on the kept set. ``df.sample()`` has
    neither property. Rates ride a literal CASE/map — no join, one
    projection+filter over one scan.
    """
    for k, v in rates.items():
        if not 0 <= v <= 1:
            raise ValueError(f"rate for {k!r} must be in [0, 1]: {v}")
    if not 0 <= default_rate <= 1:
        raise ValueError(f"default_rate must be in [0, 1]: {default_rate}")
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(int(round(v * _BUCKETS)))]
    rate_map = F.create_map(*pairs) if pairs else None
    thresh = (
        F.coalesce(rate_map[F.col(stratum_col)], F.lit(int(round(default_rate * _BUCKETS))))
        if rate_map is not None
        else F.lit(int(round(default_rate * _BUCKETS)))
    )
    return df.filter(split_bucket(F.col(id_col), salt) < thresh)


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: str = "mix-v1",
) -> DataFrame:
    """Temperature-flattened domain mixture sampling — the corpus-mixing step
    that downsamples dominant sources toward a flatter distribution (the
    Pile / multilingual-LM ``p_d ∝ n_d^alpha`` recipe) WITHOUT upsampling:
    every document of the smallest domain is kept, and domain ``d`` keeps a
    deterministic ``(n_min / n_d)^(1 - alpha)`` fraction.

    That closed form is the alpha-temperature target restated so the
    cross-domain normalizer cancels: target weight ``w_d ∝ n_d^alpha`` with
    total size chosen as the largest not requiring upsampling gives keep rate
    ``w_d * T / n_d = (n_min / n_d)^(1-alpha)``. No sum over domains means no
    float-summation-order dependence — at ``alpha=0.5`` the rate is
    ``sqrt(n_min/n_d)``, and IEEE sqrt/divide are correctly rounded, so Spark
    and the DuckDB oracle compute bit-identical rates. (Other alphas use
    ``pow``, which libms only guarantee to 1 ulp — fine for sampling, not for
    a hash-exact oracle; the registered oracle query pins alpha=0.5.)

    Returns one row per INPUT document: ``(doc_id, <domain_col>, n_domain,
    sample_bp, keep)`` with ``sample_bp`` the keep threshold in basis points
    and ``keep`` the deterministic hash-Bernoulli draw (same stability
    contract as split_assign: pure function of (salt, id, corpus counts)).

    Scale shape: domain counts are a partial-aggregated groupBy collapsing to
    a handful of rows; they broadcast-join back onto the corpus scan. Two
    scans of the corpus total (count pass + assign pass) — the minimum for
    any rate-from-corpus-statistics sampler.

    Alpha semantics: 1.0 = natural mixture (keep everything), 0.0 = uniform
    (every domain cut to n_min docs in expectation).
    """
    if not 0 <= alpha <= 1:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_domain"))
    nmin = counts.agg(F.min("n_domain").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_domain").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        F.col(domain_col),
        F.col("n_domain"),
        F.floor(rate * _BUCKETS).cast("bigint").alias("sample_bp"),
    )
    return df.join(F.broadcast(rates), domain_col).select(
        F.col(id_col),
        F.col(domain_col),
        F.col("n_domain"),
        F.col("sample_bp"),
        (split_bucket(F.col(id_col), salt) < F.col("sample_bp")).alias("keep"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed token-budget bins
    (the "sample packing" step that batches variable-length documents into
    training sequences without padding waste). Returns
    ``(doc_id, shard, bin_idx, n_tokens)``.

    Packing is inherently sequential — each bin decision depends on the
    running fill — so a single global greedy pass cannot parallelize. The
    scalable contract: shard deterministically (``id % n_shards``), pack each
    shard's documents in id order with an independent greedy pass, and make
    bins unique by (shard, bin_idx). Shards pack in parallel (one
    applyInPandas task each; pick n_shards ~ cluster cores at real scale) and
    the assignment is a pure function of (corpus, budget, n_shards) — stable
    across re-runs and repartitioning, and exactly reproducible by the
    DuckDB recursive-CTE oracle twin.

    Greedy rule (both engines, including the oversized-doc case): a document
    opens a new bin iff the current bin's fill plus its tokens would exceed
    the budget; a document longer than the whole budget gets a bin to itself.
    Token counts ride the shared token_count contract (ws_trim + WS-class
    split; null/empty text -> 0 tokens).
    """
    import pandas as pd

    from ..functions.text import token_count

    cnt = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bins = []
        b, fill = -1, 0
        for nt in pdf["n_tokens"]:
            if b < 0 or fill + nt > budget:
                b, fill = b + 1, 0
            fill += nt
            bins.append(b)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin_idx", "n_tokens"]]

    return cnt.groupBy("shard").applyInPandas(
        _pack, schema="doc_id long, shard int, bin_idx long, n_tokens long"
    )


def dataset_card(
    df: DataFrame,
    salt: str = "v1",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-(split, language) dataset statistics card — the summary table a
    dataset release ships (HF dataset cards / Dolma-style reports): document
    and token counts, mean length, and the quality-gate keep rate, broken out
    by train/val/test split and language.

    Returns ``(split, lang, n_docs, total_tokens, avg_chars, n_keep,
    keep_rate)``.

    Scale shape: split assignment and the quality gate are both pure
    projections, so they FUSE into the one corpus scan (quality_filter's
    keep_cols passthrough avoids a doc_id join back); the only shuffle is the
    final (split, lang) aggregation — a handful of groups, partial-aggregated
    map-side to almost nothing.
    """
    from ..functions.text import quality_filter

    q = quality_filter(df, id_col=id_col, keep_cols=(lang_col, chars_col))
    return (
        q.groupBy(
            split_expr(F.col(id_col), salt, weights).alias("split"),
            F.col(lang_col).alias("lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg(chars_col), 4).alias("avg_chars"),
            F.count(F.when(F.col("keep"), F.lit(1))).alias("n_keep"),
        )
        .withColumn("keep_rate", F.round(F.col("n_keep") / F.col("n_docs"), 4))
    )
