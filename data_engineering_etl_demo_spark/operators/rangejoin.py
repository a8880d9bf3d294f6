"""Bucketed range (interval) join — a custom operator Spark lacks natively.

The naive formulation — an inequality theta-join
``p.ts BETWEEN i.start AND i.end`` — plans as BroadcastNestedLoopJoin (or a
cartesian product when neither side fits in memory): O(|P|·|I|) comparisons
and no shuffle key at all.  This implements the standard scalable rewrite:

    quantize time into fixed-width buckets → points carry their single
    bucket, intervals EXPLODE to every bucket they overlap → one hash
    shuffle equi-join on (key…, bucket) → refine with the exact
    inequality predicate.

Cost: one shuffle of |P| + |I|·avg_buckets_per_interval rows.  The bucket
width is the knob — set it near the typical interval length so intervals
explode to ~2 buckets; the pair space examined per task is bounded by
bucket population, not corpus size.  A point matches an interval only
inside the point's own bucket, so the join produces no duplicate pairs and
needs no post-dedup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_SEC = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner join of ``points`` rows onto every ``intervals`` row of the same
    key with start <= point_ts < end (``end_inclusive=True`` makes it <=).
    Output carries all columns of both sides (names must not collide apart
    from the key)."""
    keys = [key] if isinstance(key, str) else list(key)
    width = F.lit(bucket_seconds * US_PER_SEC)

    p = points.withColumn(
        "_bkt", F.floor(F.unix_micros(F.col(point_ts)) / width).cast("long")
    )
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width).cast("long"),
                F.floor(F.unix_micros(F.col(end_col)) / width).cast("long"),
            )
        ),
    )
    end_pred = (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    return (
        p.join(i, on=keys + ["_bkt"])
        .filter((F.col(point_ts) >= F.col(start_col)) & end_pred)
        .drop("_bkt")
    )
