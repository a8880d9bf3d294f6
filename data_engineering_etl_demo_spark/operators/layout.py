"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100 TB lake is read through zone maps: parquet row-group / file min-max
statistics let a scan skip everything outside the query's predicate range.
A linear sort optimizes skipping for ONE leading column only — every file
spans the full domain of every other column.  Interleaving the bits of
several columns (the Z-order / Morton curve, the same layout Delta's
OPTIMIZE ZORDER BY and Databricks liquid clustering target) makes every
participating column's per-file span shrink like the curve's locality,
so predicates on ANY of the clustered columns skip files.

Everything here is expression-level (Catalyst built-ins, whole-stage
codegen); the rewrite itself is one range exchange + in-partition sort —
exactly the shuffle a global ORDER BY would pay, but producing a layout
that serves all clustered dimensions instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.operators.maintenance import (
    parquet_layout,
    swap_dir,
)

ZORDER_BITS = 16  # 2 dims x 16 bits -> 32-bit z-value, BIGINT-safe


def zorder_key(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Bit i of column j lands at position ``i * n_cols + j``, so the result
    cycles through the dimensions one bit at a time — the classic Z-curve.
    Inputs must already be non-negative integers in [0, 2**bits); use
    :func:`normalize_dim` to rank-scale arbitrary columns first.  The
    expression tree is ``bits * n_cols`` shift/mask/add terms — all
    Catalyst built-ins, fully inside whole-stage codegen.
    """
    n = len(cols)
    # widen to LONG first: shiftleft keeps its operand's width, so an INT
    # input would wrap negative once a bit lands at position >= 31
    wide = [c.cast("long") for c in cols]
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, c in enumerate(wide)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_zorder_key(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """The DuckDB replay of :func:`zorder_key` — same bit positions, same
    shift/mask arithmetic, so z-values agree engine-to-engine bit-exactly."""
    n = len(cols)
    # CAST each input to BIGINT: DuckDB's << keeps the operand's width, so
    # shifting an INTEGER column past bit 31 overflows instead of widening
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def normalize_dim(c: Column, lo: Column, hi: Column, bits: int = ZORDER_BITS) -> Column:
    """Min-max scale a column to the integer grid [0, 2**bits).

    ``lo``/``hi`` are literal columns (driver-side scalars from one tiny
    min/max aggregate).  Constant columns (hi == lo) map to 0.
    """
    span = hi - lo
    grid = F.lit((1 << bits) - 1)
    return F.when(span <= 0, F.lit(0)).otherwise(
        ((c - lo).cast("double") / span.cast("double") * grid).cast("long")
    )


def zorder_rewrite(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> dict:
    """Rewrite a parquet directory clustered on the Z-curve of ``cols``.

    One pass computes per-column min/max (a scalar aggregate — the only
    driver-side data), a second range-partitions on the z-value and sorts
    within partitions, so every output file covers a compact z-range and
    its min-max stats are tight in EVERY clustered column.  Same
    crash-recoverable two-rename swap as compact_parquet / the warehouse
    MERGE: readers never observe a half-written table.

    Row content is unchanged (the z-value is dropped before write);
    returns {files_after, n_rows, cols}.
    """
    df = spark.read.parquet(path)
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    dims = [
        normalize_dim(
            F.col(c),
            F.lit(bounds[f"lo_{c}"]),
            F.lit(bounds[f"hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    zed = df.withColumn("__z", zorder_key(dims, bits))
    staging = path + ".staging"
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(staging)
    )
    swap_dir(path, staging)
    # measure, don't echo the request: skewed/low-cardinality z-values
    # leave range partitions empty, which emit no part-file
    files_after, _ = parquet_layout(path)
    n_rows = spark.read.parquet(path).count()
    return {"files_after": files_after, "n_rows": n_rows, "cols": list(cols)}


def file_spans(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of each column — the zone map a data-skipping
    reader consults.  Grouped on the file provenance column, so the stats
    come from one scan, no metadata APIs."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("__f").agg(*aggs)
