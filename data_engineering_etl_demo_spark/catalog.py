"""Testdata catalog: parquet tables → DataFrames / temp views.

TESTDATA.md: tables region nation customer supplier part orders lineitem
events documents embeddings, one parquet per table under
/root/testdata/sf{0.001,0.01,0.1}/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


# Parquet TIMESTAMP(NANOS) (written by pandas/pyarrow, e.g. events.ts) is not
# a legal Spark type.  Reading nanos as raw int64 and truncating to micros
# matches DuckDB's TIMESTAMP_NS → TIMESTAMP(µs) truncation, so both engines
# see identical values.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# DataFrame plan cache: spark.read.parquet re-lists files and re-resolves the
# schema on every call; reusing the (immutable) plan object removes that
# fixed per-query cost.  Keyed by the context's applicationId — unlike
# id(spark), it can never be recycled by a stop()+restart that allocates a
# new session at the same address, so a stale analyzed plan is unreachable.
_df_cache: dict[tuple, DataFrame] = {}


def session_key(spark: SparkSession) -> str:
    """Stable identity of the underlying SparkContext (applicationId is
    unique per context; a restarted session gets a fresh one)."""
    return spark.sparkContext.applicationId


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (session_key(spark), sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    df = _load(spark, sf_dir, name)
    _df_cache[key] = df
    return df


def _ts_columns(path: str) -> list[str]:
    """Timestamp-typed columns per the parquet FOOTER — the ground truth
    that survives any Spark-side reader conversion (nanosAsLong turns a
    TIMESTAMP(NANOS) column into a plain int64 in the Spark schema, so
    the Spark dtype alone can't tell a nanos timestamp from a real long)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return [f.name for f in schema if pa.types.is_timestamp(f.type)]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    # ANY table's timestamp encoding can drift between testdata
    # generations (events.ts did in round 2: NANOS → µs-NTZ; lineitem/
    # orders dates have the same exposure) — and the nanosAsLong conf is
    # SESSION-GLOBAL once set, so every table must normalize, not just
    # events.  The footer decides which columns are timestamps; the
    # Spark dtype after read decides which normalization applies.
    ts_cols = _ts_columns(path)
    if ts_cols:
        spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(path)
    for col in ts_cols:
        df = _normalize_ts(df, col)
    return df


def _normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize a parquet timestamp column to Spark ``TimestampType``
    regardless of how it was physically encoded:

    - TIMESTAMP(NANOS)  → read as int64 under nanosAsLong; truncate to µs
      (integer division — epoch nanos ~1.7e18 overflow double precision),
      matching DuckDB's TIMESTAMP_NS → TIMESTAMP truncation.
    - timestamp[us] no tz → Spark infers TIMESTAMP_NTZ; cast under the UTC
      session tz preserves the wall clock, matching DuckDB's naive read.
    - timestamp[us] with tz → already TimestampType; pass through.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
