"""Fluent user-facing API — the engine's equivalent of the reference CLI.

A timberjack user maps their invocation 1:1:

    timber --chop "ERROR" --level ERROR -f service=api --trend --stats --top-errors 5 app.log

    ->  (Timber.read(spark, "transcripts.parquet")
            .chop("ERROR").level("ERROR").field("service", "api")
            .stats(top_errors=5).report())

Each setter is pure (returns a new Timber); nothing executes until a terminal
call (`count`, `report`, `frames`, `route_to`). Reference CLI surface:
/root/reference/src/cli.rs:7-59.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession

from .functions.extract import MODES
from .operators.analyze import LogQuery, analyze, collect_report, matched, render_text
from .sources.detect import detect_format


def _validate_mode(mode: str) -> str:
    """Fail at the setter, like the reference CLI fails at parse time on an
    unknown --format (/root/reference/src/main.rs:134-136) — not lazily at the
    first action."""
    if mode not in MODES:
        raise ValueError(f"format must be one of {MODES}, got {mode!r}")
    return mode


@dataclass(frozen=True)
class Timber:
    df: DataFrame
    pattern: str | None = None
    level_filter: str | None = None
    fields: dict[str, str] = field(default_factory=dict)
    mode: str = "auto"
    trends: bool = False
    stats_on: bool = False
    top_errors: int = 5
    show_unique: bool = False
    use_pandas_grok: bool = False
    text_col: str = "text"

    # ---- sources --------------------------------------------------------
    @staticmethod
    def read(spark: SparkSession, path: str, fmt: str | None = None, text_col: str = "text") -> "Timber":
        """fmt: 'json' | 'generic' | 'auto' | 'detect' (sampled probe, like the
        reference's automatic detection) | None -> 'auto' (per-row)."""
        text_suffixes = (
            ".txt", ".log",
            ".txt.gz", ".log.gz", ".txt.bz2", ".log.bz2",  # Hadoop codecs decode transparently
        )
        is_text = path.endswith(text_suffixes)
        if not is_text:
            # a DIRECTORY of text logs must not silently take the parquet
            # path (it would fail with an opaque footer error, or worse,
            # half-read mixed content): sniff the member FILE suffixes, one
            # partition level deep (logs/2024-01-01/a.log layouts). Local
            # filesystem only — remote URIs (isdir False) keep the explicit
            # suffix/format contract.
            import os as _os

            if _os.path.isdir(path):
                def _files(d, depth=0):
                    for m in sorted(_os.listdir(d)):
                        if m.startswith(("_", ".")):
                            continue
                        p = _os.path.join(d, m)
                        if _os.path.isfile(p):
                            yield m
                        elif depth == 0 and _os.path.isdir(p):
                            yield from _files(p, 1)

                members = list(_files(path))
                has_text = any(m.endswith(text_suffixes) for m in members)
                has_parquet = any(m.endswith(".parquet") for m in members)
                if has_text and has_parquet:
                    raise ValueError(
                        f"directory {path!r} mixes text logs and parquet files; "
                        "point Timber.read at one format (or pass explicit globs)"
                    )
                is_text = has_text
        df = (
            spark.read.text(path).withColumnRenamed("value", text_col)
            if is_text
            else spark.read.parquet(path)
        )
        t = Timber(df=df, text_col=text_col)
        if fmt == "detect":
            return replace(t, mode=detect_format(df, text_col))
        return replace(t, mode=_validate_mode(fmt or "auto"))

    @staticmethod
    def over(df: DataFrame, text_col: str = "text") -> "Timber":
        return Timber(df=df, text_col=text_col)

    # ---- filters (all pure) ----------------------------------------------
    def chop(self, pattern: str) -> "Timber":
        """--chop: literal substring fast path or regex, auto-routed."""
        return replace(self, pattern=pattern)

    def level(self, level: str) -> "Timber":
        return replace(self, level_filter=level)

    def field(self, key: str, value: str) -> "Timber":
        """-f k=v (repeatable, ANDed)."""
        return replace(self, fields={**self.fields, key: value})

    def format(self, mode: str) -> "Timber":
        return replace(self, mode=_validate_mode(mode))

    def trend(self, on: bool = True) -> "Timber":
        return replace(self, trends=on)

    def stats(self, on: bool = True, top_errors: int = 5, show_unique: bool = False) -> "Timber":
        return replace(self, stats_on=on, top_errors=top_errors, show_unique=show_unique)

    def pandas_grok(self, on: bool = True) -> "Timber":
        return replace(self, use_pandas_grok=on)

    # ---- terminals --------------------------------------------------------
    def _query(self) -> LogQuery:
        return LogQuery(
            pattern=self.pattern,
            level=self.level_filter,
            field_filters=self.fields,
            mode=self.mode,
            trends=self.trends,
            stats=self.stats_on,
            top_errors=self.top_errors,
            show_unique=self.show_unique,
            use_pandas_grok=self.use_pandas_grok,
        )

    def matched(self) -> DataFrame:
        """The parsed+filtered spine as a DataFrame (lazy)."""
        return matched(self.df, self._query(), self.text_col)

    def frames(self, cache: bool = False) -> dict[str, DataFrame]:
        """Every requested aggregate as a lazy DataFrame."""
        return analyze(self.df, self._query(), self.text_col, cache=cache)

    def count(self) -> int:
        """--count: Catalyst prunes everything but the count automatically."""
        return self.matched().count()

    def report(self) -> dict:
        """The reference's JSON document (formatter.rs:7-48)."""
        q = self._query()
        frames = analyze(self.df, q, self.text_col, cache=True)
        try:
            return collect_report(frames, q)
        finally:
            frames["matched"].unpersist()

    def report_text(self) -> str:
        """The reference's stdout rendering."""
        return render_text(self.report())

    def route_to(self, base_path: str, n_buckets: int = 8) -> dict:
        """Enrich + route + resumable fan-out; returns per-sink counts."""
        from .fixtures import dim_role_df, dim_tool_df
        from .operators.enrich import enrich
        from .operators.route import with_category
        from .sources.checkpoint import run_resumable_fanout

        spark = self.df.sparkSession
        routed = with_category(self.matched())
        enriched = enrich(routed, dim_role_df(spark), dim_tool_df(spark))
        return run_resumable_fanout(enriched, base_path, n_buckets=n_buckets)
