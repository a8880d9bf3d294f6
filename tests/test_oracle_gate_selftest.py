"""Mutation self-tests for the correctness gate (r11).

Every green row in CORRECTNESS_r*.json flows through
``tests/oracle_compare.compare_query``; if that compare ever rotted into
an always-ok (a broken canonicalizer, a dropped branch), the whole
177-query gate would go silently vacuous.  These tests pin, with a
minimal in-memory spec, that each failure mode actually FAILS and each
documented canonicalization actually holds:

- value drift            -> "value mismatch"
- row-count drift        -> "row count"
- column-name drift      -> "column mismatch" (the alias rule the driver
                            contract documents: same values under a
                            different name must NOT pass)
- column order           -> ok (compare sorts columns by name)
- row order              -> ok (compare sorts rows)
- NaN                    -> equal to itself (canonicalized, not float!=)
- duplicate rows         -> multiplicity respected (2 copies != 1 copy)
"""

from types import SimpleNamespace

import duckdb
import pytest

from tests.oracle_compare import compare_query


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spec(rows, cols, oracle):
    def spark_fn(spark, sf_dir):
        return spark.createDataFrame(rows, cols)

    return SimpleNamespace(spark_fn=spark_fn, oracle=oracle)


def test_matching_result_passes(spark, duck):
    spec = _spec(
        [(1, "x"), (2, "y")],
        ["k", "v"],
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'x'),"
        " (CAST(2 AS BIGINT), 'y')) AS t(k, v)",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert ok, msg


def test_value_drift_fails(spark, duck):
    spec = _spec(
        [(1, "x")],
        ["k", "v"],
        "SELECT CAST(1 AS BIGINT) AS k, 'DRIFT' AS v",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert not ok and "value mismatch" in msg, msg


def test_row_count_drift_fails(spark, duck):
    spec = _spec(
        [(1,), (2,)],
        ["k"],
        "SELECT CAST(1 AS BIGINT) AS k",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert not ok and "row count" in msg, msg


def test_column_name_drift_fails(spark, duck):
    # The documented alias rule: identical values under a different
    # column name must fail (the driver sorts columns BY NAME).
    spec = _spec(
        [(1,)],
        ["sum_qty"],
        'SELECT CAST(1 AS BIGINT) AS "sum(l_quantity)"',
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert not ok and "column mismatch" in msg, msg


def test_column_order_is_canonicalized(spark, duck):
    spec = _spec(
        [("x", 1)],
        ["v", "k"],
        "SELECT CAST(1 AS BIGINT) AS k, 'x' AS v",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert ok, msg


def test_row_order_is_canonicalized(spark, duck):
    spec = _spec(
        [(2,), (1,)],
        ["k"],
        "SELECT CAST(1 AS BIGINT) AS k UNION ALL SELECT CAST(2 AS BIGINT)",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert ok, msg


def test_nan_equals_nan_after_canonicalization(spark, duck):
    spec = _spec(
        [(float("nan"),)],
        ["x"],
        "SELECT CAST('NaN' AS DOUBLE) AS x",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert ok, msg


def test_duplicate_row_multiplicity_respected(spark, duck):
    spec = _spec(
        [(1,), (1,)],
        ["k"],
        "SELECT CAST(1 AS BIGINT) AS k",
    )
    ok, msg = compare_query(spark, duck, spec, "/nonexistent")
    assert not ok, "two copies of a row compared equal to one copy"
