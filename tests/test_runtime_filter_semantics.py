"""Independent-oracle hardening for the engine-internal runtime-filter
queries (VERDICT r5 item 8): lineitem_bloom_prune and
lineitem_zonemap_skip are hash-compared against oracles that REPLAY the
same bit/page spec, which verifies determinism but would co-sign a shared
spec bug.  These tests assert the SEMANTIC contract instead — pruning
must be a pure optimization: the rows a pruned plan produces are exactly
the rows the unpruned plan produces, at sf0.01, independent of any
replayed spec.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.plans import scale_patterns as SP
from data_engineering_etl_demo_spark.operators import layout as L

SF_DIR = "/root/testdata/sf0.01"


def test_bloom_prune_semijoin_equals_unpruned(spark):
    """Rows surviving (bloom candidate filter -> real semi-join) must equal
    the plain unpruned semi-join rows: the bloom stage may only pass
    false POSITIVES (removed by the real join), never drop a true match."""
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    sel = orders.filter(F.col("o_totalprice") > SP._BLOOM_PRICE).select(
        "o_orderkey"
    )

    direct = (
        li.join(sel, li["l_orderkey"] == sel["o_orderkey"], "left_semi")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )

    # candidate = all K bloom positions set in the bitmap built from sel
    bits = {
        r["pos"]
        for r in sel.select(
            F.explode(
                F.array(
                    *[
                        SP._bloom_pos(F.col("o_orderkey"), j)
                        for j in range(SP._BLOOM_K)
                    ]
                )
            ).alias("pos")
        ).collect()
    }
    cand = li
    for j in range(SP._BLOOM_K):
        cand = cand.withColumn(
            f"pos{j}", SP._bloom_pos(F.col("l_orderkey"), j)
        )
    cand = cand.filter(
        F.expr(
            " AND ".join(
                f"pos{j} IN ({','.join(map(str, sorted(bits)))})"
                for j in range(SP._BLOOM_K)
            )
        )
    )
    pruned = (
        cand.join(sel, cand["l_orderkey"] == sel["o_orderkey"], "left_semi")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, direct))
    assert len(direct) > 0  # the predicate actually selects something


def test_zonemap_pruned_scan_equals_full_scan(spark):
    """Scanning only the zone-map-surviving z-pages and applying the box
    predicate must return exactly the full-scan predicate rows — a page
    wrongly pruned (zone-map false negative) would drop real matches,
    which the spec-replaying oracle could never see."""
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    b = li.agg(
        F.min("l_partkey").alias("lo_p"),
        F.max("l_partkey").alias("hi_p"),
        F.min("l_suppkey").alias("lo_s"),
        F.max("l_suppkey").alias("hi_s"),
    ).first()
    p1 = b["lo_p"] + ((b["hi_p"] - b["lo_p"]) * 2) // 5
    p2 = b["lo_p"] + (b["hi_p"] - b["lo_p"]) // 2
    s1 = b["lo_s"] + (b["hi_s"] - b["lo_s"]) // 10
    s2 = b["lo_s"] + (b["hi_s"] - b["lo_s"]) // 5
    box = (
        F.col("l_partkey").between(p1, p2)
        & F.col("l_suppkey").between(s1, s2)
    )

    paged = (
        li.withColumn("lo_p", F.lit(b["lo_p"]))
        .withColumn("hi_p", F.lit(b["hi_p"]))
        .withColumn("lo_s", F.lit(b["lo_s"]))
        .withColumn("hi_s", F.lit(b["hi_s"]))
        .select(
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.shiftright(
                L.zorder_key(
                    [
                        SP._norm16("l_partkey", "lo_p", "hi_p"),
                        SP._norm16("l_suppkey", "lo_s", "hi_s"),
                    ]
                ),
                SP._Z_SHIFT,
            ).alias("page"),
        )
    )
    zones = paged.groupBy("page").agg(
        F.min("l_partkey").alias("min_p"),
        F.max("l_partkey").alias("max_p"),
        F.min("l_suppkey").alias("min_s"),
        F.max("l_suppkey").alias("max_s"),
    )
    surviving = zones.filter(
        ~(
            (F.col("max_p") < p1)
            | (F.col("min_p") > p2)
            | (F.col("max_s") < s1)
            | (F.col("min_s") > s2)
        )
    ).select("page")
    full = paged.filter(box).select("l_orderkey", "l_linenumber").collect()
    pruned = (
        paged.join(F.broadcast(surviving), "page")
        .filter(box)
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))
    assert len(full) > 0
    # and pruning is real: at least one page was skipped
    assert surviving.count() < zones.count()
