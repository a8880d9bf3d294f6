"""Deterministic distinct sketches: hash60 must equal a Python md5 replay;
KMV must be EXACT below k distinct values; both estimators must land within
their design error bounds on larger cardinalities."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_etl_demo_spark.operators import sketches as K

SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _py_hash60(value) -> int:
    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def hashed(spark):
    # group "small": 20 distinct (< k → KMV exact); "big": 2000 distinct
    rows = [("small", v) for v in range(20)] * 3
    rows += [("big", 1_000_000 + v) for v in range(2000)]
    df = spark.createDataFrame(rows, SCHEMA)
    return df.select("g", "v", K.hash60(F.col("v")).alias("h"))


def test_hash60_matches_python_md5(hashed):
    for r in hashed.filter(F.col("g") == "small").distinct().collect():
        assert r["h"] == _py_hash60(r["v"])


def test_kmv_exact_below_k(hashed):
    got = {r["g"]: r["kmv_users"] for r in K.kmv_distinct(hashed, "g", "h").collect()}
    assert got["small"] == 20  # below k ⇒ sketch degenerates to exact


def test_kmv_estimate_within_bound(hashed):
    got = {r["g"]: r["kmv_users"] for r in K.kmv_distinct(hashed, "g", "h").collect()}
    # ~1/sqrt(k) ≈ 12.5% design error at k=64; allow 3 sigma
    assert abs(got["big"] - 2000) / 2000 < 0.375


def test_hll_estimate_within_bound(hashed):
    got = {r["g"]: r["hll_users"] for r in K.hll_distinct(hashed, "g", "h").collect()}
    # raw HLL (no small-range correction): ~1.04/sqrt(m) ≈ 13% at m=64
    assert abs(got["big"] - 2000) / 2000 < 0.39
    # small group has no accuracy promise without linear counting, but the
    # estimate must still be positive and bounded
    assert 0 < got["small"] < 200


def test_kmv_day_partials_merge_exactly(spark):
    # Mergeability is exact, not approximate: the k smallest of the union
    # of per-day k-minima equal the k smallest of the union, so the merged
    # estimate must EQUAL the direct estimate for every group.
    from data_engineering_etl_demo_spark.plans import all_specs

    rows = all_specs()["events_kmv_merge"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected at least one group"
    for r in rows:
        assert r["merged_kmv"] == r["direct_kmv"], r
