"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_engineering_etl_demo_spark``; queries
self-register in ``data_engineering_etl_demo_spark.plans.REGISTRY``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_etl_demo_spark.catalog import SMOKE_SF_DIR  # noqa: E402
from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402
from data_engineering_etl_demo_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the signup→purchase funnel
    (scan → canonicalize → conditional distinct aggregation → guarded ratio),
    the reference's most involved analytics query (SURVEY.md §2.4 A5)."""
    tune_session(spark)
    specs = all_specs()
    return specs["funnel"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
