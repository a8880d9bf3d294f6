"""Declarative data-quality constraints: dbt-style table tests as ONE
Spark plan per rule, unioned into a single violations report.

The shape a pipeline actually wants before trusting or publishing a
table: each rule reduces to a per-rule 1-row aggregate (violation count),
and the report is the union of those tiny relations — k rules move k rows
total, never the tables themselves.  Rule kinds:

  not_null(col)              rows where col IS NULL
  unique(cols)               surplus rows beyond one per key
                             (sum over key groups of cnt-1; null keys
                             group together identically in both engines)
  foreign_key(col, parent)   non-null child keys with no parent row
                             (LEFT ANTI against the parent's key column)
  accepted_values(col, vals) non-null values outside the declared vocab
  in_range(col, lo, hi)      non-null values outside [lo, hi]

Scale design: not_null / accepted_values / in_range are scan-local
predicates that collapse map-side to one partial per task; unique is one
groupBy on the key (the same shuffle a dedup pays — unavoidable for exact
uniqueness; swap in a KMV/HLL sketch when an estimate suffices);
foreign_key broadcasts the parent's distinct key column only when the
caller declares the parent dim-sized (broadcast=True); a fact-sized
parent stays unhinted so AQE sizes the anti-join itself.  Nothing ever
collects rows to the driver; the report is |rules| rows.

Reference parity note: the reference's quality layer reports row counters
(pipeline/quality.py); this operator generalizes it to declared,
per-rule, re-runnable constraints — the missing "tests for data" tier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report_row(rule_id: str, table: str, kind: str, count_df: DataFrame):
    return count_df.select(
        F.lit(rule_id).alias("rule_id"),
        F.lit(table).alias("table_name"),
        F.lit(kind).alias("kind"),
        F.col("n").cast("long").alias("n_violations"),
    )


def not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    c = df.agg(F.count_if(F.col(col).isNull()).alias("n"))
    return _report_row(f"not_null:{table}.{col}", table, "not_null", c)


def unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    c = g.agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n"))
    return _report_row(
        f"unique:{table}.{'+'.join(cols)}", table, "unique", c
    )


def foreign_key(
    child: DataFrame,
    table: str,
    col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast: bool = False,
) -> DataFrame:
    """``broadcast=True`` force-ships the parent's distinct key column to
    every executor — only ask for it when the parent is genuinely
    dim-sized; for a fact-sized parent leave it False so the optimizer
    (AQE) picks shuffle vs broadcast from the observed size."""
    keys = parent.select(F.col(parent_col).alias(col)).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    orphans = (
        child.select(col)
        .filter(F.col(col).isNotNull())
        .join(keys, on=col, how="left_anti")
    )
    c = orphans.agg(F.count(F.lit(1)).alias("n"))
    return _report_row(
        f"foreign_key:{table}.{col}", table, "foreign_key", c
    )


def accepted_values(
    df: DataFrame, table: str, col: str, values: list[str]
) -> DataFrame:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(values)
    c = df.agg(F.count_if(bad).alias("n"))
    return _report_row(
        f"accepted_values:{table}.{col}", table, "accepted_values", c
    )


def in_range(
    df: DataFrame, table: str, col: str, lo: float, hi: float
) -> DataFrame:
    bad = F.col(col).isNotNull() & (
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
    )
    c = df.agg(F.count_if(bad).alias("n"))
    return _report_row(f"in_range:{table}.{col}", table, "in_range", c)


def constraint_report(rules: list[DataFrame]) -> DataFrame:
    """Union the per-rule relations into one report, ordered by rule_id."""
    return reduce(lambda a, b: a.unionByName(b), rules).orderBy("rule_id")
