"""P3 materialized fields map: dotted paths, array indexing, scalar
stringification, 100-field recursion cap (reference json.rs:50-90)."""

import pytest
from pyspark.sql import functions as F

from timberjack_spark.functions.fields import field_name_histogram, with_fields_map

ROWS = [
    (0, '{"a": 1, "b": {"c": "x", "d": {"e": true}}, "f": null}'),
    (1, '{"items": [{"name": "n0"}, {"name": "n1"}], "n": 2.5}'),
    (2, "not json at all"),
    (3, '{"broken": '),          # malformed -> no map
    (4, "[1, 2, 3]"),            # valid JSON but not an object -> no map
    (5, '{"a": 7}'),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def test_fields_map_semantics(df):
    out = {r["id"]: r["fields"] for r in with_fields_map(df).collect()}
    assert out[0] == {"a": "1", "b.c": "x", "b.d.e": "true", "f": "null"}
    assert out[1] == {"items[0].name": "n0", "items[1].name": "n1", "n": "2.5"}
    assert out[2] is None and out[3] is None and out[4] is None
    assert out[5] == {"a": "7"}


def test_field_histogram(df):
    hist = {r["field"]: r["cnt"] for r in field_name_histogram(df).collect()}
    assert hist["a"] == 2
    assert hist["b.d.e"] == 1
    assert hist["items[0].name"] == 1
    assert "broken" not in hist


def test_recursion_cap_gates_containers_not_scalars(spark):
    # 150 scalar keys: ALL are inserted (the cap only gates container recursion)
    wide = "{" + ",".join(f'"k{i:03d}": {i}' for i in range(150)) + "}"
    # 100 scalars + a nested object sorted AFTER them: recursion is skipped
    capped = (
        "{"
        + ",".join(f'"k{i:03d}": {i}' for i in range(100))
        + ', "z_nested": {"inner": 1}'
        + "}"
    )
    df = spark.createDataFrame([(0, wide), (1, capped)], "id long, text string")
    out = {r["id"]: r["fields"] for r in with_fields_map(df).collect()}
    assert len(out[0]) == 150
    assert len(out[1]) == 100 and "z_nested.inner" not in out[1]


def test_histogram_on_fixture(spark):
    from timberjack_spark.fixtures import transcripts_path

    df = spark.read.parquet(transcripts_path("sf0.001"))
    hist = {r["field"]: r["cnt"] for r in field_name_histogram(df).collect()}
    # every fixture JSON line carries these top-level fields
    assert hist["service"] == hist["level"] == hist["timestamp"] == hist["message"]
    assert hist["request.headers.content-type"] >= 1  # nested dotted path
    assert hist["user.role"] >= 1


def test_field_coverage_profile(spark):
    """Coverage fractions count only successfully-parsed JSON rows in the
    denominator; values stringify on the reference contract (bool/null as
    JSON literals); non-JSON rows are invisible."""
    from timberjack_spark.functions.fields import field_coverage

    rows = [
        (0, '{"a": 1, "b": {"c": "x"}}'),
        (1, '{"a": 2}'),
        (2, '{"a": 1, "flag": true, "gone": null}'),
        (3, 'plain text line'),
        (4, '{broken json'),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {r["field"]: r for r in field_coverage(df).collect()}
    # 3 parsed JSON rows (broken json parses to null map -> excluded)
    assert out["a"]["n_present"] == 3 and out["a"]["n_distinct"] == 2
    assert out["a"]["coverage"] == 1.0
    assert out["b.c"]["n_present"] == 1 and abs(out["b.c"]["coverage"] - 1 / 3) < 1e-12
    assert out["flag"]["n_distinct"] == 1 and out["gone"]["n_present"] == 1
    assert set(out) == {"a", "b.c", "flag", "gone"}
