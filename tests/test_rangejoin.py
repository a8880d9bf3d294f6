"""Bucketed interval join: the quantize+explode+refine plan must produce
exactly the pairs of the naive inequality theta-join — including intervals
spanning many buckets and points on bucket/interval boundaries."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_etl_demo_spark.operators.rangejoin import interval_join

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


POINT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("pid", T.LongType()),
        T.StructField("pts", T.TimestampType()),
    ]
)
IVL_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("iid", T.LongType()),
        T.StructField("s", T.TimestampType()),
        T.StructField("e", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [
            ("a", 1, _ts(0)),
            ("a", 2, _ts(10)),
            ("a", 3, _ts(30)),  # exactly at an interval end
            ("a", 4, _ts(95)),
            ("b", 5, _ts(10)),  # same time, different key
            ("a", 6, _ts(59.5)),
        ],
        POINT_SCHEMA,
    )
    intervals = spark.createDataFrame(
        [
            ("a", 10, _ts(0), _ts(30)),  # [0, 30)
            ("a", 11, _ts(5), _ts(100)),  # spans many 10-min buckets
            ("a", 12, _ts(95), _ts(96)),  # sub-bucket interval
            ("b", 13, _ts(0), _ts(30)),
        ],
        IVL_SCHEMA,
    )
    return points, intervals


def _naive(points, intervals, end_inclusive):
    end_pred = (
        F.col("pts") <= F.col("e") if end_inclusive else F.col("pts") < F.col("e")
    )
    return {
        (r["pid"], r["iid"])
        for r in points.join(intervals, on="k")
        .filter((F.col("pts") >= F.col("s")) & end_pred)
        .collect()
    }


@pytest.mark.parametrize("bucket_seconds", [600, 60, 7200])
@pytest.mark.parametrize("end_inclusive", [False, True])
def test_matches_naive_theta_join(sides, bucket_seconds, end_inclusive):
    points, intervals = sides
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points,
            intervals,
            key="k",
            point_ts="pts",
            start_col="s",
            end_col="e",
            bucket_seconds=bucket_seconds,
            end_inclusive=end_inclusive,
        ).collect()
    }
    assert got == _naive(points, intervals, end_inclusive)


def test_boundary_semantics(sides):
    points, intervals = sides
    pairs = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "k", "pts", "s", "e", bucket_seconds=600
        ).collect()
    }
    assert (1, 10) in pairs  # start is inclusive
    assert (3, 10) not in pairs  # end exclusive by default
    assert (3, 11) in pairs  # mid-interval
    assert (5, 13) in pairs and (5, 10) not in pairs  # key isolation
    assert (4, 12) in pairs  # sub-bucket interval still found
