"""Replica of the driver's Spark-vs-DuckDB correctness compare.

For each registered QuerySpec: run the Spark plan and the DuckDB oracle on
the same sf dir, sort columns by name, sort rows, and compare canonicalized
values.  Exact equality is required — the whole point of the decimal-sum /
epoch-µs conventions in the plans is that both engines produce bit-identical
values.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from data_engineering_etl_demo_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def rows_canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, con, spec, sf_dir: str) -> tuple[bool, str]:
    sdf = spec.spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")
    res = con.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return (False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        return (False, f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    sc = rows_canonical(s_cols, s_rows)
    dc = rows_canonical(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return (False, f"value mismatch, first diffs: {diffs}")
    return (True, f"ok: {len(s_rows)} rows")
