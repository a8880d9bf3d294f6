"""Round-7 infrastructure invariants: shared persisted relations and the
per-drain-unique streaming memory sink."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# _shared_relation: one materialization per (session, sf_dir), honest base
# ---------------------------------------------------------------------------


def test_shared_relation_is_memoized_and_cached(spark):
    from data_engineering_etl_demo_spark.plans.llmdata import (
        _near_dup_pairs_shared,
    )

    a = _near_dup_pairs_shared(spark, SF_DIR)
    b = _near_dup_pairs_shared(spark, SF_DIR)
    # same DataFrame object: consumers share ONE persisted instance —
    # a fresh object per call would unpersist/re-persist via the slot
    # and re-materialize, defeating the sharing
    assert a is b
    assert a.storageLevel.useMemory


def test_shared_relation_does_not_cache_the_registered_plan(spark):
    """The cache holds a PROJECTION of the registered near-dup plan, so
    the registered query's own execution must not be served from it —
    its bench timing stays honest.  InMemoryRelation appears in the
    consumer's optimized plan for the PAIR relation, while the
    registered plan gains no new cache hit beyond the shingle persist
    it always had."""
    from data_engineering_etl_demo_spark.plans import all_specs
    from data_engineering_etl_demo_spark.plans.llmdata import (
        _near_dup_pairs_shared,
    )

    specs = all_specs()

    def n_inmem(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count(
            "InMemoryRelation"
        )

    base_before = n_inmem(specs["docs_minhash_near_dup"].spark_fn(spark, SF_DIR))
    shared = _near_dup_pairs_shared(spark, SF_DIR)
    shared.count()  # materialize
    base_after = n_inmem(specs["docs_minhash_near_dup"].spark_fn(spark, SF_DIR))
    assert base_after == base_before
    # a consumer built ON the shared relation reads the cache
    consumer = shared.groupBy("id_a").count()
    assert n_inmem(consumer) >= 1


def test_shared_pairs_match_registered_pairs(spark):
    from data_engineering_etl_demo_spark.plans import all_specs
    from data_engineering_etl_demo_spark.plans.llmdata import (
        _near_dup_pairs_shared,
    )

    reg = sorted(
        map(
            tuple,
            all_specs()["docs_minhash_near_dup"]
            .spark_fn(spark, SF_DIR)
            .select("id_a", "id_b")
            .collect(),
        )
    )
    shared = sorted(map(tuple, _near_dup_pairs_shared(spark, SF_DIR).collect()))
    assert shared == reg


# ---------------------------------------------------------------------------
# run_to_completion: per-drain-unique sink, previous generation dropped
# ---------------------------------------------------------------------------


def _tiny_stream(session, tmpdir: str):
    import pyspark.sql.types as T

    df = session.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k long, v string"
    )
    df.write.mode("overwrite").parquet(tmpdir)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    return session.readStream.schema(schema).parquet(tmpdir)


def test_redrain_same_name_never_replaces_previous_result(spark, tmp_path):
    """ADVICE r6: a second drain under the same query_name must not
    silently replace the memory table underneath the first drain's
    returned DataFrame.  With per-drain-unique sink names each returned
    DataFrame is bound to its OWN resolved sink relation, so the first
    result stays intact across a re-drain, while the re-drain drops the
    first sink's catalog entry (bounded accumulation: one live view per
    query_name)."""
    from data_engineering_etl_demo_spark.streaming import pipeline as P

    src = str(tmp_path / "src")
    first = P.run_to_completion(
        lambda s: _tiny_stream(s, src),
        query_name="round7_redrain",
        shuffle_partitions=2,
        spark=spark,
    )
    session = first.sparkSession  # the pooled drain clone
    views_after_first = {
        t.name for t in session.catalog.listTables() if "round7_redrain" in t.name
    }
    assert len(views_after_first) == 1
    assert first.count() == 3
    second = P.run_to_completion(
        lambda s: _tiny_stream(s, src),
        query_name="round7_redrain",
        shuffle_partitions=2,
        spark=spark,
    )
    assert sorted(map(tuple, second.collect())) == [
        (1, "a"),
        (2, "b"),
        (3, "a"),
    ]
    # the first result is NOT silently replaced — it still reads its own
    # sink relation (resolved at creation), unchanged
    assert first.count() == 3
    # ...but its catalog entry is gone: one live view per query_name
    views_after_second = {
        t.name for t in session.catalog.listTables() if "round7_redrain" in t.name
    }
    assert len(views_after_second) == 1
    assert views_after_second != views_after_first


def test_distinct_query_names_coexist(spark, tmp_path):
    from data_engineering_etl_demo_spark.streaming import pipeline as P

    src = str(tmp_path / "src2")
    a = P.run_to_completion(
        lambda s: _tiny_stream(s, src),
        query_name="round7_coexist_a",
        shuffle_partitions=2,
        spark=spark,
    )
    b = P.run_to_completion(
        lambda s: _tiny_stream(s, src),
        query_name="round7_coexist_b",
        shuffle_partitions=2,
        spark=spark,
    )
    # different names never evict each other
    assert a.count() == 3 and b.count() == 3


def test_concentration_volumes_helper_matches_naive_ranks(spark):
    """Histogram rank algebra == the per-row row_number formulation on a
    tie-heavy volume multiset (the identity the r7 rewrite rests on)."""
    from data_engineering_etl_demo_spark.plans.timeseries import (
        concentration_from_volumes,
    )

    vols = [1, 1, 1, 2, 2, 5, 5, 5, 5, 9, 40, 40, 41, 100, 100, 100]
    u = spark.createDataFrame([(c,) for c in vols], "c long")
    row = concentration_from_volumes(u).collect()[0]

    svols = sorted(vols)
    n, s = len(svols), sum(svols)
    ra_dot = sum((i + 1) * c for i, c in enumerate(svols))
    k1, k10 = max(n // 100, 1), max(n // 10, 1)
    assert row["n_users"] == n and row["n_events"] == s
    assert row["top1pct_share_ppm"] == sum(svols[-k1:]) * 10**6 // s
    assert row["top10pct_share_ppm"] == sum(svols[-k10:]) * 10**6 // s
    assert row["gini_ppm"] == max(
        2 * ra_dot * 10**6 // (n * s) - (n + 1) * 10**6 // n, 0
    )


def test_shared_relations_isolated_per_sf_dir(spark):
    """sf0.001 and sf0.01 shared pair relations must not evict each other:
    the persist slot is sf-suffixed and the memo is keyed by sf_dir."""
    from data_engineering_etl_demo_spark.plans.llmdata import (
        _near_dup_pairs_shared,
    )

    a = _near_dup_pairs_shared(spark, "/root/testdata/sf0.001")
    b = _near_dup_pairs_shared(spark, "/root/testdata/sf0.01")
    assert a is not b
    a.count(), b.count()
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    # re-request of the first sf returns the same still-cached instance
    assert _near_dup_pairs_shared(spark, "/root/testdata/sf0.001") is a


def test_concentration_identity_property(spark):
    """Property: the histogram rank algebra equals the naive per-row rank
    formulation for arbitrary volume multisets (hypothesis-driven)."""
    from hypothesis import given, settings, strategies as st

    from data_engineering_etl_demo_spark.plans.timeseries import (
        concentration_from_volumes,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=120)
    )
    def check(vols):
        u = spark.createDataFrame([(c,) for c in vols], "c long")
        row = concentration_from_volumes(u).collect()[0]
        svols = sorted(vols)
        n, s = len(svols), sum(svols)
        ra_dot = sum((i + 1) * c for i, c in enumerate(svols))
        k1, k10 = max(n // 100, 1), max(n // 10, 1)
        assert row["n_users"] == n and row["n_events"] == s
        assert row["top1pct_share_ppm"] == sum(svols[-k1:]) * 10**6 // s
        assert row["top10pct_share_ppm"] == sum(svols[-k10:]) * 10**6 // s
        assert row["gini_ppm"] == max(
            2 * ra_dot * 10**6 // (n * s) - (n + 1) * 10**6 // n, 0
        )

    check()


def test_latest_green_derived_from_artifacts():
    """_LATEST_GREEN must mirror the committed CORRECTNESS_r*.json union:
    every green row contributes, the newest round wins, and error rows
    grant nothing (r1 recorded failures for docs_pack_batches and
    events_user_scd2 that later rounds fixed)."""
    import glob
    import json
    import re

    from data_engineering_etl_demo_spark.plans import (
        _LATEST_GREEN,
        _row_is_green,
    )

    expect = {}
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if _row_is_green(row):
                expect[name] = max(expect.get(name, 0), rnd)
    assert _LATEST_GREEN == expect
    assert len(expect) > 100  # artifacts actually loaded
