"""r16 optimization-round equivalence pins.

Each test pins a batch-2 rewrite to the exact semantics of the form it
replaced (the batch-1 rewrites are pinned by tests/test_r15_optimizations.py
adversarial-bucket pins, the cache-honesty lint, and the oracle replay).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_etl_demo_spark.operators import sketches as K


def test_cm_estimates_from_counts_matches_raw_rows(spark):
    # multiple groups, skewed multiplicities, forced counter collisions
    # (199 keys into 64 counters per row)
    rows = [
        (f"g{v % 3}", v % 199)
        for v in range(5000)
    ] + [("g0", 7)] * 500  # one hot key
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("k", T.LongType()),
            ]
        ),
    )
    raw = {
        (r["g"], r["k"]): r["cm_n"]
        for r in K.cm_estimates(df, "g", "k").collect()
    }
    counts = df.groupBy("g", "k").agg(F.count(F.lit(1)).alias("n"))
    agg = {
        (r["g"], r["k"]): r["cm_n"]
        for r in K.cm_estimates_from_counts(counts, "g", "k", "n").collect()
    }
    # bit-identical estimates, collisions and all: every counter is an
    # integer sum, so weight-n updates equal n unit updates exactly
    assert agg == raw


def test_incremental_rollup_conditional_merge(spark):
    # types present in only one of the two states must mirror the old
    # left-join NULL -> 0 behavior, and totals must merge exactly
    rows = [
        # ("old"-day rows)               (newest-day rows)
        ("click", "2024-01-01", 1.25), ("click", "2024-01-03", 2.50),
        ("view", "2024-01-02", 0.75),  # mv-only type
        ("buy", "2024-01-03", 9.99),   # delta-only type
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("day_s", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
    ).select(
        "event_type",
        F.to_date("day_s").alias("day"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_f"),
    )
    mx = df.agg(F.max("day").alias("last_day"))
    ed = df.crossJoin(F.broadcast(mx)).filter(F.col("day").isNotNull())
    parts = ed.groupBy(
        "event_type", (F.col("day") == F.col("last_day")).alias("is_delta")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v_f").cast("long").alias("s_f"))
    out = {
        r["event_type"]: (r["mv"], r["d"], r["n"])
        for r in parts.groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.when(~F.col("is_delta"), F.col("n"))), F.lit(0)
            ).alias("mv"),
            F.coalesce(
                F.sum(F.when(F.col("is_delta"), F.col("n"))), F.lit(0)
            ).alias("d"),
            F.sum("n").alias("n"),
        )
        .collect()
    }
    assert out == {
        "click": (1, 1, 2),
        "view": (1, 0, 1),
        "buy": (0, 1, 1),
    }
