"""As-of (nearest-earlier) join — a custom operator Spark lacks natively.

The naive formulation (range join ``r.ts <= l.ts`` then max-per-left-row)
explodes to O(|L|·|R|) pairs per key before the aggregation prunes them.
This implements the scalable sort-merge form instead:

    union both sides → ONE hash shuffle on the key → ONE sort by
    (ts, side, tiebreak) → a running last(ignorenulls) window carries the
    most recent right-side payload forward onto each left row.

Cost is one shuffle + sort of |L|+|R| rows — the same complexity class as
a sort-merge equi-join, with no pair explosion.  Skew is bounded by
per-key row counts (salt the key upstream if a single key is huge).

Tie semantics at equal timestamps are controlled by the side ordering:
``strict=True`` (right.ts < left.ts) sorts left rows first so a same-tick
right row is invisible; ``strict=False`` (<=) sorts right rows first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ASOF_PREFIX = "asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``asof_<c>`` columns holding
    the payload of the latest ``right`` row of the same key with
    right.ts < left.ts (``strict``) or <= (otherwise); nulls when no such
    row exists.  ``tiebreak`` (a right payload column) makes the winner
    among equal right timestamps deterministic — the greatest wins."""
    keys = [key] if isinstance(key, str) else list(key)
    lside, rside = (0, 1) if strict else (1, 0)

    l2 = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_side", F.lit(lside)
    )
    # The whole payload rides in ONE struct so the running last() is
    # row-consistent: carrying each column independently with
    # last(ignorenulls) would replace a legitimately-NULL payload value in
    # the matched right row with the value from an OLDER right row —
    # tearing the row and emitting a payload that never existed.  A struct
    # is non-null on every right row (even when all its fields are null)
    # and null on interleaved left rows, which is exactly the distinction
    # ignorenulls needs.
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(rside).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("_t").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r.{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_carried")
    )
    return carried.filter(F.col("_side") == lside).select(
        "*",
        *[
            F.col(f"_carried.{c}").alias(f"{ASOF_PREFIX}{c}")
            for c in payload_cols
        ],
    ).drop("_t", "_side", "_r", "_carried")
