"""Table profiling operator: per-column stats in one declarative plan.

The profile a data-quality/observability layer computes before trusting a
table: row count, null count, exact distinct count, canonical min/max.

Scale design: ONE aggregate per column, unioned — not one aggregate with k
countDistincts (Catalyst plans multi-distinct aggregates with an Expand
that replicates every input row k times through the shuffle).  Each
per-column aggregate scans a single-column projection (columnar pruning
makes each scan touch one column's pages only) and reduces map-side to a
1-row partial, so the union of k plans moves k rows total through k tiny
exchanges.  At 100 TB you would swap countDistinct for the HLL sketch in
operators/sketches.py; exact distincts keep this oracle-checkable.

Canonical value representation (engine-exact across Spark/DuckDB):
  long      -> decimal string
  string    -> identity
  money     -> floor(x*100) cents as decimal string (no double formatting)
  timestamp -> epoch microseconds as decimal string
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KINDS = ("long", "string", "money", "ts")


def _canon(kind: str, c: Column) -> Column:
    if kind == "long":
        return c.cast("string")
    if kind == "string":
        return c
    if kind == "money":
        return F.floor(c * 100).cast("long").cast("string")
    if kind == "ts":
        return F.unix_micros(c).cast("string")
    raise ValueError(f"unknown kind {kind!r}")


def profile(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_repr, max_repr) per col."""
    parts = []
    for name, kind in cols:
        if kind not in KINDS:
            raise ValueError(f"unknown kind {kind!r} for {name}")
        d = df.select(F.col(name).alias("x"))
        parts.append(
            d.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("x").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.countDistinct("x").alias("n_distinct"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
            ).select(
                F.lit(name).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                _canon(kind, F.col("mn")).alias("min_repr"),
                _canon(kind, F.col("mx")).alias("max_repr"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def sql_profile(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB oracle mirroring profile() term-for-term."""

    def canon(kind: str, expr: str) -> str:
        if kind == "long":
            return f"CAST({expr} AS VARCHAR)"
        if kind == "string":
            return expr
        if kind == "money":
            return f"CAST(CAST(floor(({expr}) * 100) AS BIGINT) AS VARCHAR)"
        if kind == "ts":
            return f"CAST(epoch_us({expr}) AS VARCHAR)"
        raise ValueError(kind)

    selects = [
        f"""
        SELECT '{name}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
               {canon(kind, f'min({name})')} AS min_repr,
               {canon(kind, f'max({name})')} AS max_repr
        FROM {table}
        """
        for name, kind in cols
    ]
    return " UNION ALL ".join(selects) + " ORDER BY col_name"
