"""Filter/predicate algebra.

Every predicate is a Catalyst ``Column`` so Catalyst can push it into the scan
(parquet/Iceberg row-group pruning for literal patterns) and keep it inside
whole-stage codegen. The literal-vs-regex specialization mirrors the reference's
matcher selection (/root/reference/src/analyzer.rs:170-208): a literal pattern
compiles to ``Contains`` (the analog of its memchr/SIMD fast path), anything
with regex metacharacters compiles to ``RLike``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.extract import _json_path, ws_trim
from ..functions.patterns import is_complex_pattern


def pattern_predicate(text: Column, pattern: str) -> Column:
    """--chop: case-sensitive substring for simple patterns, regex otherwise."""
    if is_complex_pattern(pattern):
        return text.rlike(pattern)
    return text.contains(pattern)


def level_predicate(level: Column, wanted: str) -> Column:
    """--level: extracted level non-empty AND case-insensitive equality.

    Note the reference's colon quirk flows through: an extracted level "ERROR:"
    never equals the filter "ERROR" (src/analyzer.rs:248-253).
    """
    return (level != "") & (F.upper(level) == wanted.upper())


def parse_field_filters(filters: list[str]) -> dict[str, str]:
    """Parse ``k=v`` CLI-style filters; entries without '=' are silently dropped
    (the reference's documented-but-unimplemented ``k>v`` comparisons are
    deliberately NOT implemented — src/analyzer.rs:115-123, SURVEY.md §7.0)."""
    out: dict[str, str] = {}
    for f in filters:
        if "=" in f:
            k, _, v = f.partition("=")
            out[k.strip()] = v.strip()
    return out


def field_predicate(text: Column, key: str, value: str, mode: str = "auto") -> Column:
    """-f k=v: if the parsed JSON field exists -> trimmed, case-insensitive
    equality; else fall back to raw-line case-insensitive substring search for
    BOTH key and value (src/analyzer.rs:126-163).

    In generic mode there are no parsed fields, so the fallback always applies.
    Flattened dotted keys ("user.id") and indexed keys ("errors[0].code") map
    directly onto JSON paths.
    """
    lower_line = F.lower(text)
    fallback = lower_line.contains(key.strip().lower()) & lower_line.contains(value.strip().lower())
    if mode == "generic":
        return fallback
    field = F.get_json_object(ws_trim(text), _json_path(key.strip()))
    # ws_trim, not F.trim: the reference trims whitespace (Rust str::trim),
    # Spark's trim strips spaces only
    return F.when(field.isNotNull(), F.lower(ws_trim(field)) == value.strip().lower()).otherwise(fallback)


def field_filters_predicate(text: Column, filters: dict[str, str], mode: str = "auto") -> Column:
    """AND of all -f predicates (vacuously true when empty)."""
    pred = F.lit(True)
    for k, v in filters.items():
        pred = pred & field_predicate(text, k, v, mode)
    return pred
