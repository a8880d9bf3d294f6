"""Physical-layout scale patterns: bucketed co-located joins must plan
WITHOUT a shuffle, partitioned tables must prune partitions at scan time.
These are the two table-layout decisions SURVEY.md §4 calls out (the
reference's SQLite indexes have no Spark analog — partitioning and
bucketing are the replacements)."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.catalog import load

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """orders + lineitem written bucketed by the join key into external
    parquet tables.  8 buckets: at 100 TB the bucket count is sized to
    target split sizes; what matters is both sides agreeing."""
    base = tmp_path_factory.mktemp("bucketed")
    names = {}
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"{table}_b_{uuid.uuid4().hex[:8]}"
        (
            load(spark, SF_DIR, table)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / name))
            .saveAsTable(name)
        )
        names[table] = name
    yield names
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table(bucketed_tables["orders"])
    li = spark.table(bucketed_tables["lineitem"])
    # disable auto-broadcast so the join would otherwise need a shuffle
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _physical_plan(joined)
        # bucket-aligned scan feeds the join directly: no Exchange below it
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the co-located join computes the same answer as the plain one
        expect = (
            load(spark, SF_DIR, "lineitem")
            .join(
                load(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes_at_scan(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("partitioned") / "events_by_day")
    events = load(spark, SF_DIR, "events").withColumn(
        "event_date", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    events.write.partitionBy("event_date").mode("overwrite").parquet(base)

    back = spark.read.parquet(base)
    one_day = back.select("event_date").distinct().limit(1).collect()[0][0]
    pruned = back.filter(F.col("event_date") == one_day)
    plan = _physical_plan(pruned)
    # the date predicate must land in PartitionFilters (pruning), not in
    # the post-scan Filter: only the one day's files are read
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]
    n_days = back.select("event_date").distinct().count()
    assert n_days > 1  # pruning is meaningful
    assert (
        pruned.count()
        == events.filter(F.col("event_date") == one_day).count()
    )


def test_zonemap_skip_zorder_beats_linear_trailing_dim(spark):
    """The read-side payoff: for a 2-D box predicate, zone maps over the
    z-order pages must bound the scanned rows tighter than the linear
    (part, supp) sort — the linear layout's trailing dimension spans
    nearly the full domain per page, so its pages can't be pruned on
    l_suppkey.  Both bounds must still cover every true match (zone-map
    pruning is never allowed to drop a matching row)."""
    from data_engineering_etl_demo_spark.plans import all_specs

    row = all_specs()["lineitem_zonemap_skip"].spark_fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert row["rows_matching"] <= row["z_rows_scanned"]
    assert row["rows_matching"] <= row["lin_rows_scanned"]
    assert row["z_rows_scanned"] < row["lin_rows_scanned"]
    assert row["z_pages_scanned"] < row["z_pages_total"]
