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
