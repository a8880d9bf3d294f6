"""Schema-drift guard: the catalog must hand every plan a Spark
``TimestampType`` ts column no matter how the testdata physically encodes
it.  Round 2's entire regression (14 ERR driver queries + a silently-wrong
streaming reader) was the testdata moving from parquet TIMESTAMP(NANOS) to
timestamp[us]-no-tz while the readers hardcoded the old encoding — this
file pins all three encodings so the next drift is one failing unit test.
"""

import datetime
import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_engineering_etl_demo_spark import catalog

# one wall-clock instant, written three ways
_WALL = datetime.datetime(2024, 1, 2, 3, 4, 5, 678901)
_EPOCH_US = int(_WALL.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def _write_events(path: str, ts_type: pa.DataType) -> None:
    ts = pa.array([_WALL], type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["click"], type=pa.string()),
            "value": pa.array([1.5], type=pa.float64()),
            "props": pa.array(["{}"], type=pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("ns"),  # round-1 testdata: TIMESTAMP(NANOS)
        pa.timestamp("us"),  # round-2 testdata: µs, no tz → Spark NTZ
        pa.timestamp("us", tz="UTC"),  # µs with tz → Spark TimestampType
    ],
    ids=["nanos", "us_ntz", "us_ltz"],
)
def test_catalog_normalizes_every_ts_encoding(spark, tmp_path, ts_type):
    sf_dir = tmp_path / "sf_drift"
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ts_type)

    df = catalog._load(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # value check: the UTC session tz makes wall clock == epoch instant
    row = df.selectExpr("unix_micros(ts) AS us").first()
    assert row["us"] == _EPOCH_US


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos", "us_ntz", "us_ltz"],
)
def test_streaming_reader_matches_every_ts_encoding(spark, tmp_path, ts_type):
    """The streaming reader builds its schema from the parquet footer; all
    three encodings must produce identical TimestampType values."""
    from data_engineering_etl_demo_spark.plans import streaming_plans as SP

    sf_dir = tmp_path / f"sf_stream_{ts_type!s}".replace("[", "_").replace("]", "_")
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ts_type)

    schema, mode = SP._events_read_schema(str(sf_dir))
    if mode == "nanos_long":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(schema).parquet(str(sf_dir / "events.parquet"))
    if mode == "nanos_long":
        from pyspark.sql import functions as F

        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif mode == "ntz":
        raw = raw.withColumn("ts", raw["ts"].cast("timestamp"))
    assert isinstance(raw.schema["ts"].dataType, T.TimestampType)
    assert raw.selectExpr("unix_micros(ts) AS us").first()["us"] == _EPOCH_US


def test_real_testdata_ts_is_timestamp(spark):
    """Whatever the driver generated THIS round, the catalog must produce
    TimestampType for events.ts at every scale factor present."""
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        df = catalog.load(spark, sf_dir, "events")
        assert isinstance(
            df.schema["ts"].dataType, T.TimestampType
        ), f"{sf_dir}: ts resolved to {df.schema['ts'].dataType}"


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos", "us_ntz", "us_ltz"],
)
def test_catalog_normalizes_non_events_tables_too(spark, tmp_path, ts_type):
    """lineitem/orders date columns have the SAME drift exposure events.ts
    had (and the nanosAsLong conf is session-global once set) — the
    normalization must be footer-driven for every table, not an events
    special case."""
    sf_dir = tmp_path / "sf_drift_li"
    sf_dir.mkdir()
    table = pa.table(
        {
            "l_orderkey": pa.array([1], type=pa.int64()),
            "l_quantity": pa.array([2.0], type=pa.float64()),
            "l_shipdate": pa.array([_WALL], type=ts_type),
        }
    )
    pq.write_table(table, str(sf_dir / "lineitem.parquet"))

    df = catalog._load(spark, str(sf_dir), "lineitem")
    assert isinstance(df.schema["l_shipdate"].dataType, T.TimestampType)
    row = df.selectExpr("unix_micros(l_shipdate) AS us").first()
    assert row["us"] == _EPOCH_US
