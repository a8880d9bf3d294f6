"""Small-file compaction: data-identical rewrite, honest report, no-op on
already-compact tables."""

from __future__ import annotations

from data_engineering_etl_demo_spark.operators.maintenance import (
    compact_parquet,
    parquet_layout,
)


def _fragmented_table(spark, tmp_path, n_files=20):
    path = str(tmp_path / "frag")
    spark.range(0, 2000).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 7 AS STRING) AS k"
    ).repartition(n_files).write.parquet(path)
    return path


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = _fragmented_table(spark, tmp_path)
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    n_before, total = parquet_layout(path)
    assert n_before == 20
    report = compact_parquet(spark, path, target_bytes=total)
    assert report["skipped"] is False
    assert report["files_before"] == 20
    assert report["files_after"] < 20
    after_rows = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows
    # schema survives byte-for-byte semantics
    assert spark.read.parquet(path).schema.fieldNames() == ["id", "v", "k"]


def test_compaction_is_idempotent_noop_when_compact(spark, tmp_path):
    path = _fragmented_table(spark, tmp_path)
    _, total = parquet_layout(path)
    compact_parquet(spark, path, target_bytes=total)
    again = compact_parquet(spark, path, target_bytes=total)
    assert again["skipped"] is True
    assert again["files_after"] == again["files_before"]


# ---------------------------------------------------------------------------
# Column profiler (operators/profile.py)
# ---------------------------------------------------------------------------


def test_profile_nulls_and_canonical_reprs(spark):
    from datetime import datetime

    from data_engineering_etl_demo_spark.operators import profile as P

    df = spark.createDataFrame(
        [
            (1, "a", 1.005, datetime(2024, 1, 1, 0, 0, 0)),
            (2, None, -2.5, datetime(2024, 1, 2, 0, 0, 0)),
            (None, "b", None, None),
            (2, "b", 10.0, datetime(2024, 1, 2, 0, 0, 0)),
        ],
        "k long, s string, m double, t timestamp",
    )
    out = {
        r["col_name"]: r
        for r in P.profile(
            df, [("k", "long"), ("s", "string"), ("m", "money"), ("t", "ts")]
        ).collect()
    }
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 1
    assert out["k"]["n_distinct"] == 2  # distinct ignores the null
    assert out["k"]["min_repr"] == "1" and out["k"]["max_repr"] == "2"
    assert out["s"]["min_repr"] == "a" and out["s"]["max_repr"] == "b"
    # money: floor-cents, not double formatting (1.005*100 -> floor -> 100)
    assert out["m"]["min_repr"] == "-250" and out["m"]["max_repr"] == "1000"
    # ts: epoch microseconds
    assert out["t"]["min_repr"] == "1704067200000000"
    assert out["t"]["n_null"] == 1


def test_profile_rejects_unknown_kind(spark):
    import pytest as _pt

    from data_engineering_etl_demo_spark.operators import profile as P

    df = spark.range(1)
    with _pt.raises(ValueError):
        P.profile(df, [("id", "float")])


def test_bucketized_join_is_exchange_free(spark, tmp_path):
    """Both sides bucketed on the join key -> the join plan contains no
    shuffle Exchange (and no extra sort: buckets are written sorted)."""
    from data_engineering_etl_demo_spark.operators.maintenance import bucketize

    left = spark.range(10_000).selectExpr(
        "id AS k", "id * 2 AS lv"
    )
    right = spark.range(5_000).selectExpr("id AS k", "id * 3 AS rv")
    bucketize(spark, left, "b_left", ["k"], 8, str(tmp_path / "bl"))
    bucketize(spark, right, "b_right", ["k"], 8, str(tmp_path / "br"))
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner must pick a merge join — the
        # scenario bucketing exists for is two FACT-sized sides, where
        # broadcast is off the table anyway
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_left")
            .join(spark.table("b_right"), "k")
            .where("rv IS NOT NULL")
        )
        phys = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in phys, phys
        assert joined.count() == 5_000
        # and the unbucketed control DOES shuffle, so the assertion means
        # something
        plain_l = spark.read.parquet(str(tmp_path / "bl"))
        plain_r = spark.read.parquet(str(tmp_path / "br"))
        control = plain_l.join(plain_r, "k").where("rv IS NOT NULL")
        cphys = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cphys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
