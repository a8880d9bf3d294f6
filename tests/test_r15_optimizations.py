"""Focused pins for the r15 optimization-round internals.

Each optimization changed HOW an operator computes, never WHAT — these
tests pin the equivalences the rewrites rely on, on adversarial synthetic
inputs (wide buckets, singletons, self-loops, empty sets) rather than the
fixture corpus the oracle replay already covers.
"""

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# local_df: the Arrow createDataFrame path must be value- and
# schema-identical to the pickled-RDD path it replaced
# ---------------------------------------------------------------------------


def test_local_df_matches_list_path(spark):
    from data_engineering_etl_demo_spark.functions.local_rows import local_df

    rows = [(1, "a", 1.5), (2, None, -0.25), (None, "c", None)]
    schema = "k long, s string, v double"
    got = local_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, ref.collect()), key=repr
    )


def test_local_df_empty_rows(spark):
    from data_engineering_etl_demo_spark.functions.local_rows import local_df

    got = local_df(spark, [], "node long, component long")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["node", "component"]


# ---------------------------------------------------------------------------
# lsh_candidate_pairs: the group-local array expansion must produce the
# exact pair set of the bucket self-join it replaced, including the
# mega-bucket guard's width semantics
# ---------------------------------------------------------------------------


def _self_join_pairs(buckets, max_bucket_width):
    """The pre-r15 reference implementation (bucket self-join)."""
    if max_bucket_width is not None:
        keep = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_w"))
            .filter(F.col("_w") <= max_bucket_width)
            .select("band", "bucket")
        )
        buckets = buckets.join(keep, on=["band", "bucket"])
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


@pytest.mark.parametrize("cap", [None, 3])
def test_lsh_candidate_pairs_equals_self_join(spark, cap):
    from data_engineering_etl_demo_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    # adversarial bucket table: a wide 5-member bucket (above the cap),
    # a 3-member bucket (at the cap), singletons, a cross-band repeat
    # pair (distinct must collapse it), and unsorted insertion order
    rows = [
        (5, 0, "w"), (3, 0, "w"), (9, 0, "w"), (1, 0, "w"), (7, 0, "w"),
        (20, 1, "x"), (10, 1, "x"), (30, 1, "x"),
        (99, 2, "y"),
        (10, 3, "z"), (20, 3, "z"),
    ]
    buckets = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    got = sorted(
        map(tuple, lsh_candidate_pairs(buckets, "doc_id", cap).collect())
    )
    want = sorted(map(tuple, _self_join_pairs(buckets, cap).collect()))
    assert got == want
    assert all(a < b for a, b in got)
    if cap == 3:
        # the 5-wide bucket is guarded away; the pair (10, 20) survives
        # via the width-2 band-3 bucket even though its other collision
        # is capped
        assert (10, 20) in got and (1, 3) not in got


def test_incremental_pairs_cross_split_only(spark):
    from data_engineering_etl_demo_spark.operators.dedup import (
        incremental_near_dup,
    )

    # two exact-duplicate text groups straddling the split: every flagged
    # incoming doc must match an EXISTING doc (id < split), never another
    # incoming one, and jaccard of identical text is 1.0
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "alpha beta gamma delta epsilon zeta eta theta"),
            (102, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = incremental_near_dup(docs, split_id=100).collect()
    flagged = {r["doc_id"]: r["dup_of"] for r in out}
    assert flagged == {100: 1, 101: 1}


# ---------------------------------------------------------------------------
# connected_components / bounded_hops: the limit-probe fast path must keep
# self-loop vertices, singleton labeling, and the distributed-path escape
# ---------------------------------------------------------------------------


def test_cc_fast_path_self_loop_and_chain(spark):
    from data_engineering_etl_demo_spark.operators.graph import (
        connected_components_with_rounds,
    )

    edges = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    labels, rounds = connected_components_with_rounds(edges)
    assert rounds == 0  # driver fast path
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {7: 7, 1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_probe_sends_large_graphs_distributed(spark):
    from data_engineering_etl_demo_spark.operators.graph import (
        connected_components_with_rounds,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    # threshold below the raw row count -> probe must take the star rounds
    labels, rounds = connected_components_with_rounds(
        edges, driver_threshold=5
    )
    assert rounds >= 1
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert set(got.values()) == {0}


def test_bounded_hops_fast_path_matches_distributed(spark):
    from data_engineering_etl_demo_spark.operators.graph import bounded_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 9)], "id_a long, id_b long"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "doc_id long")
    fast = {
        (r["node"], r["hop"])
        for r in bounded_hops(edges, seeds, max_hops=2).collect()
    }
    slow = {
        (r["node"], r["hop"])
        for r in bounded_hops(
            edges, seeds, max_hops=2, driver_threshold=0
        ).collect()
    }
    assert fast == slow == {(1, 0), (9, 0), (2, 1), (3, 2)}


# ---------------------------------------------------------------------------
# run_to_completion no_data_batch contract
# ---------------------------------------------------------------------------


def test_no_data_batch_false_requires_clone_form(spark):
    from data_engineering_etl_demo_spark.streaming import pipeline as P

    with pytest.raises(ValueError, match="no_data_batch"):
        P.run_to_completion(
            lambda s: None,
            "q",
            spark=spark,
            no_data_batch=False,  # builder form but no shuffle_partitions
        )


def test_drain_session_key_isolates_no_data_conf(spark):
    from data_engineering_etl_demo_spark.streaming import pipeline as P

    on = P._drain_session(spark, 4, True)
    off = P._drain_session(spark, 4, False)
    assert on is not off
    assert (
        on.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == "true"
    )
    assert (
        off.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == "false"
    )
