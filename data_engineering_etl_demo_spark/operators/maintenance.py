"""Table-maintenance operators: the housekeeping a 100 TB parquet lake
runs between queries.

Small-file compaction is the canonical one — streaming sinks and
fine-grained MERGE targets accumulate thousands of tiny files, and scan
cost at scale is dominated by file-open overhead + lost row-group
statistics.  ``compact_parquet`` rewrites a directory to
size-targeted files with the same atomic rename-swap the warehouse MERGE
uses (readers never observe a half-written table; a crash between the
two renames leaves a recoverable ``.old``, same contract as
``Warehouse._swap_write``)."""

from __future__ import annotations

import math
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 << 20  # HDFS-block-sized outputs


def parquet_layout(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory — the signal a
    compaction scheduler reads to decide whether a rewrite pays off."""
    n, total = 0, 0
    for p in Path(path).rglob("*.parquet"):
        n += 1
        total += p.stat().st_size
    return n, total


def swap_dir(path: str, staging: str) -> None:
    """Crash-recoverable two-rename directory swap (same contract as
    Warehouse._swap_write): readers never observe a half-written table;
    a crash between the renames leaves a recoverable ``.old``.  Shared
    by compact_parquet and layout.zorder_rewrite so the durability
    protocol cannot silently diverge between rewrite operators."""
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target_bytes) files.

    Returns a report dict {files_before, files_after, bytes, skipped}.
    No-op (skipped=True) when the layout is already at or below the
    target file count — compaction must be safe to run on a schedule.
    The rewrite is one narrow repartition job: no shuffle keys, just a
    round-robin exchange sized to the target; column order, types and
    row content are byte-identical under parquet re-encoding.
    """
    files_before, total = parquet_layout(path)
    n_out = max(1, math.ceil(total / target_bytes))
    if files_before <= max(n_out, min_files - 1):
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "skipped": True,
        }
    df: DataFrame = spark.read.parquet(path)
    staging = path + ".staging"
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    swap_dir(path, staging)
    files_after, _ = parquet_layout(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "skipped": False,
    }


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table registered as
    ``table`` — the storage-level half of a co-located join.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT any runtime exchange: each task reads bucket i of both sides
    and joins locally (the sort makes it a zero-sort merge join).  At
    100 TB this converts every recurring fact⨝fact join on the bucket
    key from two full shuffles per query into a one-time layout cost —
    the same contract as Hive/Iceberg bucketing.
    tests/test_maintenance.py asserts the exchange-free plan.

    Spark only honors bucket metadata through the catalog, so this is a
    ``saveAsTable`` with an explicit path, not a bare ``.parquet()``
    write; re-running replaces the table (idempotent maintenance).
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )
