"""Every registered query must match its DuckDB oracle at sf0.01 —
this mirrors the driver's t2 correctness gate."""

import pytest

from data_engineering_etl_demo_spark.plans import all_specs
from tests.oracle_compare import compare_query, duckdb_connection

SF_DIR = "/root/testdata/sf0.01"

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(spark, duck, name):
    ok, msg = compare_query(spark, duck, SPECS[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
